"""Similarity search over ``embeddings`` (64-dim float vectors) —
north-star extension (SURVEY.md §2.2): approximate-nearest-neighbor
with a brute-force cosine baseline and an LSH-bucketed scale path.

Cosine arithmetic is a *sequential fold in double* on both engines
(zip_with + aggregate in Spark; list_transform + list_reduce in DuckDB)
so scores are bit-identical — no float tolerance games in the oracle.

Scale posture: the query set is broadcast (tiny), the candidate scan is
one pass, and top-k is a partitioned window — no global sort. The LSH
variant hashes both sides into 2^8 hyperplane-sign buckets and joins on
the bucket key, turning O(Q·N) into O(Q·N/256)-expected work — the
standard distributed ANN sharding step (an IVF coarse quantizer would
replace the hash with learned centroids; same join shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashes import A, B
from ..io import fan_out_narrow, load_table
from ..persist import pin

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
LSH_PLANES = 8
LSH_TOP_K = 3
DIM = 64  # embedding dimensionality (TESTDATA embeddings.parquet)


def _emb(spark: SparkSession, sf_dir: str, fan: bool = True) -> DataFrame:
    """Embeddings with elements pre-cast to double (deterministic
    arithmetic; float ops would round differently per engine).

    r13 (guide §2.5 input skew): the single-file scan arrives as ONE
    partition, and every consumer of this relation runs interpreted
    higher-order folds (dot products, hyperplane projections) per
    vector — serialized onto one core of 32. Fan the raw rows out
    first; at production scale the scan is thousands of splits and
    this is a metadata-checked no-op. ``fan=False`` opts out for the
    one consumer whose first move is a cogroup shuffle (the block grid
    in ``dedup_embedding_nearest``) — there the extra exchange was
    measured slower, not faster."""
    df = load_table(spark, sf_dir, "embeddings")
    if fan:
        df = fan_out_narrow(df)
    return df.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        "label",
    )


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — order-deterministic (matches the
    DuckDB oracle's list_reduce bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


N_BLOCKS = 16  # block-nested-loop grid for the all-pairs scan


def _block_nearest(left, right):
    """Per-block-pair nearest-neighbor kernel (cogroup applyInPandas).

    Dots via np.cumsum over the product tensor — strictly sequential
    partial sums, bit-identical to the 0.0-seeded sequential fold /
    DuckDB list_reduce (verified over 10k random trials). Emits each
    vector's best partner WITHIN this block pair only; the global
    argmax is a max-of-maxes, so a final window over ~n·√P rows
    finishes the job without materializing the O(n²) pair relation."""
    import numpy as np
    import pandas as pd

    cols = ["vec_id", "o_id", "cos_sim_raw"]
    if len(left) == 0 or len(right) == 0:
        return pd.DataFrame({c: [] for c in cols})
    # ascending id order makes argmax's first-hit = smallest id on ties,
    # matching the row_number tie-break (cos DESC, o_id ASC)
    left = left.sort_values("vec_id")
    right = right.sort_values("vec_id")
    a = np.stack(left["emb"].to_numpy()).astype(np.float64, copy=False)
    b = np.stack(right["emb"].to_numpy()).astype(np.float64, copy=False)
    aid = left["vec_id"].to_numpy()
    bid = right["vec_id"].to_numpy()
    na = np.sqrt(np.cumsum(a * a, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(b * b, axis=1)[:, -1])
    dots = np.cumsum(a[:, None, :] * b[None, :, :], axis=2)[:, :, -1]
    cos = dots / (na[:, None] * nb[None, :])
    cos[aid[:, None] == bid[None, :]] = -np.inf  # mask self-pairs
    ja = np.argmax(cos, axis=1)  # best partner for each left vector
    jb = np.argmax(cos, axis=0)  # best partner for each right vector
    out = pd.DataFrame(
        {
            "vec_id": np.concatenate([aid, bid]),
            "o_id": np.concatenate([bid[ja], aid[jb]]),
            "cos_sim_raw": np.concatenate(
                [cos[np.arange(len(aid)), ja], cos[jb, np.arange(len(bid))]]
            ),
        }
    )
    return out[np.isfinite(out["cos_sim_raw"])]


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, one candidate
    scan, per-query window top-5 (deterministic tie-break on vec_id)."""
    emb = _with_norm(_emb(spark, sf_dir))
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    ).filter(F.col("q_id") < N_QUERIES)
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    scored = pairs.withColumn(
        "cos_sim_raw",
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim_raw", 6).alias("cos_sim"), "rk")
    )


def _bucket_col(emb: Column) -> Column:
    """Hyperplane-sign LSH bucket: plane j coefficient for dim i is
    ((A_j*(i+1) + B_j) % 61) - 30 — deterministic pseudo-random ±.

    The fold form stays inside codegen; unrolling all 8×64 terms into
    one flat expression overflows the JIT method budget and runs slower
    (measured)."""
    def _plane_term(j: int):
        return lambda x, i: x * ((F.lit(A[j]) * (i + 1) + B[j]) % 61 - 30).cast("double")

    sig = None
    for j in range(LSH_PLANES):
        proj = F.aggregate(
            F.transform(emb, _plane_term(j)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("bigint")


def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's 8-bit hyperplane
    signature; cosine + top-3 within the bucket. Equi-join on the bucket
    key ⇒ shuffle-partitionable at any scale."""
    emb = _with_norm(_emb(spark, sf_dir)).withColumn(
        "bucket", _bucket_col(F.col("emb"))
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        "bucket",
    ).filter(F.col("q_id") < N_QUERIES)
    pairs = emb.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.withColumn(
        "cos_sim_raw",
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= LSH_TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim_raw", 6).alias("cos_sim"), "rk")
    )


def dedup_embedding_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup scan: every vector's nearest neighbor
    (the near-dup decision is then a threshold on cos_sim; this corpus
    has none above 0.52, so the full ranked output is reported).

    The pair relation is O(n²), so it is never materialized: vectors
    are tiled into a √P×√P block grid (each vector replicated ~√P
    times), each block pair computes its dot matrix vectorized inside
    one Arrow batch and emits only per-vector local winners, and a
    final window over O(n·√P) candidate rows picks the global nearest
    — the standard distributed block-nested-loop ANN-exact pattern."""
    emb = _emb(spark, sf_dir, fan=False).withColumn(
        "blk", (F.col("vec_id") % N_BLOCKS).cast("int")
    )
    # left role: vector in block i joins block pairs (i, j≥i);
    # right role: vector in block j joins block pairs (i≤j, j).
    left = emb.withColumn(
        "gj", F.explode(F.sequence(F.col("blk"), F.lit(N_BLOCKS - 1)))
    ).withColumnRenamed("blk", "gi")
    right = emb.withColumn(
        "gi", F.explode(F.sequence(F.lit(0), F.col("blk")))
    ).withColumnRenamed("blk", "gj")
    cand = (
        left.groupby("gi", "gj")
        .cogroup(right.groupby("gi", "gj"))
        .applyInPandas(
            _block_nearest, "vec_id long, o_id long, cos_sim_raw double"
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim_raw"), F.asc("o_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            F.col("o_id").alias("nearest_id"),
            F.round("cos_sim_raw", 6).alias("cos_sim"),
            (F.col("cos_sim_raw") >= 0.95).alias("is_near_dup"),
        )
    )


IVF_CENTROIDS = 16  # coarse-quantizer size (vectors vec_id < 16)
IVF_NPROBE = 2
IVF_TOP_K = 3


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a 16-vector coarse quantizer (deterministic seed
    vectors stand in for trained centroids — identical join shape),
    every vector assigned to its nearest centroid (inverted lists),
    queries probe their nprobe=2 nearest lists only.

    Scale shape: assignment is a broadcast-centroids map-side pass (one
    O(n·K) scan, no shuffle), the probe join is equi on the bucket key
    — candidates ∝ n·nprobe/K instead of n per query.

    Persistence (r11): the shared 16×n centroid-scoring relation is
    ``localCheckpoint(eager=True)``-materialized, not ``.cache()``d —
    checkpoint blocks die with this query's handles (ContextCleaner),
    while CacheManager entries outlive the query until an explicit
    unpersist and accumulate across a 244-query sweep (ADVICE r10)."""
    emb = _with_norm(_emb(spark, sf_dir))
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    # one centroid-scoring pass serves both the inverted-list assignment
    # (rank 1 for every vector) and the query probe lists (rank ≤ nprobe
    # for query vectors)
    scored_cent = (
        emb.join(F.broadcast(cent))
        .withColumn(
            "c_cos",
            _dot(F.col("emb"), F.col("c_emb")) / (F.col("norm") * F.col("c_norm")),
        )
        .withColumn(
            "c_rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
            ),
        )
        .select("vec_id", "c_id", "c_rk")
        .transform(pin)
    )
    assign = scored_cent.filter(F.col("c_rk") == 1).select(
        "vec_id", F.col("c_id").alias("bucket")
    )
    probes = (
        scored_cent.filter(
            (F.col("vec_id") < N_QUERIES) & (F.col("c_rk") <= IVF_NPROBE)
        )
        .select(F.col("vec_id").alias("q_id"), F.col("c_id").alias("probe"))
    )
    q = emb.select(
        F.col("vec_id").alias("qv_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    ).filter(F.col("qv_id") < N_QUERIES)
    cand = (
        probes.join(assign, F.col("bucket") == F.col("probe"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(emb, "vec_id")
        .join(F.broadcast(q), F.col("q_id") == F.col("qv_id"))
    )
    scored = cand.withColumn(
        "cos_sim_raw",
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim_raw", 6).alias("cos_sim"), "rk")
    )


def _kmeans_bucket_fold(key, pdf):
    """Per-bucket M-step kernel (applyInPandas): members sorted by
    vec_id, per-dimension sums via numpy's axis-0 reduction over the
    (N, DIM) float64 matrix — which accumulates SEQUENTIALLY in row
    order (numpy's pairwise summation applies only to the innermost
    contiguous axis), so the sums are bit-identical to the
    0.0-seeded sequential fold / DuckDB list_reduce contract. Because
    that order is an undocumented numpy internal, the kernel re-proves
    it every run on a same-shape/same-dtype ORDER PROBE spanning the
    bucket's FULL length (not a fixed head): row 0 is 1.0 and every
    later row is 2^-53 — exactly half an ULP of 1.0. A strictly
    left-sequential fold stays exactly 1.0 (each half-ULP add ties to
    even); ANY pairwise/blocked/reversed order combines two or more
    small terms before (or instead of) folding them one-at-a-time into
    the 1.0 accumulator and lands strictly above 1.0. Decisive for
    N >= 3; for N < 3 every order is equivalent. The kernel refuses to
    emit if the probe ever detects a reordered reduction."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    a = np.stack(pdf["emb"].to_numpy()).astype(np.float64, copy=False)
    if len(a) >= 3:
        probe = np.full(a.shape, 2.0**-53, dtype=np.float64)
        probe[0, :] = 1.0
        if not np.all(probe.sum(axis=0) == 1.0):
            raise AssertionError(
                "numpy axis-0 reduction is no longer sequential; the "
                "kmeans M-step ordered-fold contract needs the catalyst "
                "fold fallback"
            )
    s = a.sum(axis=0)
    return pd.DataFrame(
        {
            "bucket": np.full(a.shape[1], key[0], dtype=np.int64),
            "pos": np.arange(a.shape[1], dtype=np.int32),
            "dim_sum": s,
            "n_members": np.full(a.shape[1], len(a), dtype=np.int64),
        }
    )


def kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-iteration M-step: element-wise mean of every
    cluster's member vectors (E-step assignment = the IVF coarse
    quantizer above). With the E-step this is k-means on DataFrames —
    the clustering primitive of a training-data pipeline (corpus
    bucketing, diversity sampling).

    Shape (the r8 constant-factor pass — VERDICT r7 task 4; output
    bits unchanged, 16×64 rows regardless of corpus size):

    - E-step IN-ROW: the {IVF_CENTROIDS} centroids are O(1) driver
      rows, so each one becomes a LITERAL double array and the argmax
      is a single map-side projection — greatest() over the per-
      centroid cosines, first-match-wins on ties (== row_number's
      cos DESC, c_id ASC with finite cosines). The r7 form built the
      same assignment as a vectors×centroids broadcast cross join
      (6.4M×16 = 102M rows at sf100) followed by a row_number window
      shuffle over all of it, then joined the winners BACK to the
      vectors — three shuffles of blown-up relations for a per-row
      decision. Cosines are bit-identical: same _dot sequential fold
      over the same double arrays, same double multiply/divide.
    - M-step: ONE shuffle of the vectors keyed on bucket, then an
      Arrow-vectorized per-bucket kernel (applyInPandas) sums
      dimensions over members ordered by vec_id — numpy's axis-0
      reduction is row-sequential, bit-identical to the previous
      collect_list → array_sort → catalyst fold and to the DuckDB
      oracle's list(ORDER BY) + list_reduce (the kernel referees
      itself per run; `tests` pin parity end-to-end). The r7 form
      posexploded BEFORE the shuffle — 410M (bucket, dim, x) rows at
      sf100 vs 6.4M vector rows here.

    Measured at sf100 (6.4M vectors): 40.7 s → 17.1 s, and every
    decade 2.4–3.7× down (SCALE.md). The remaining ~11×/decade on the
    fifth decade is the full-corpus scan floor (every vector is read
    and folded exactly once) amplified by the 16-bucket fold
    parallelism cap on 32 local cores; at 100 TB the per-bucket groups
    parallelize with k, and the ordered fold stays the oracle-parity
    harness — production uses a plain order-free sum() as documented
    since r6."""
    emb = _with_norm(_emb(spark, sf_dir))
    cents = sorted(
        emb.filter(F.col("vec_id") < IVF_CENTROIDS)
        .select("vec_id", "emb", "norm")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    if not cents:
        # empty corpus → no centroids → empty result with the
        # contract schema (the join-based r7 plan produced this
        # through its joins; the literal-centroid plan must short-
        # circuit because greatest() needs at least one cosine)
        return spark.createDataFrame(
            [], "bucket long, pos int, centroid_val double, n_members long"
        )
    ids = [int(r["vec_id"]) for r in cents]
    cos_cols = [
        (
            _dot(
                F.col("emb"),
                F.array(*[F.lit(float(x)) for x in r["emb"]]),
            )
            / (F.col("norm") * F.lit(float(r["norm"])))
        ).alias(f"c{int(r['vec_id'])}")
        for r in cents
    ]
    scored = emb.select("vec_id", "emb", *cos_cols)
    best = F.greatest(*[F.col(f"c{i}") for i in ids])
    bucket = F.when(F.col(f"c{ids[0]}") == best, F.lit(ids[0]))
    for i in ids[1:]:
        bucket = bucket.when(F.col(f"c{i}") == best, F.lit(i))
    assign = scored.select(
        bucket.cast("long").alias("bucket"), "vec_id", "emb"
    )
    agg = assign.groupBy("bucket").applyInPandas(
        _kmeans_bucket_fold,
        "bucket long, pos int, dim_sum double, n_members long",
    )
    return agg.select(
        "bucket",
        "pos",
        (F.col("dim_sum") / F.col("n_members")).alias("centroid_val"),
        "n_members",
    )


def similarity_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF ANN path against brute-force ground
    truth — the eval loop every production ANN deployment runs before
    trusting its index. Both sides reuse the exact operators above
    (same tie-breaks), truncated to the same k; the audit is a
    full-outer join on (query, neighbor) counted per query, so every
    output is an integer and recall is reported in exact ppm.

    Scale: ground truth at 100 TB comes from the same brute-force scan
    run once over a sampled query set (the standard practice); the
    audit join itself is O(Q·k) rows — negligible."""
    truth = (
        similarity_topk(spark, sf_dir)
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("q_id", "vec_id", F.lit(1).alias("in_truth"))
    )
    approx = similarity_ivf_topk(spark, sf_dir).select(
        "q_id", "vec_id", F.lit(1).alias("in_approx")
    )
    j = truth.join(approx, ["q_id", "vec_id"], "full_outer")
    per_q = j.groupBy("q_id").agg(
        F.sum("in_truth").alias("n_truth"),
        F.sum("in_approx").alias("n_retrieved"),
        F.sum(
            (F.col("in_truth").isNotNull() & F.col("in_approx").isNotNull())
            .cast("bigint")
        ).alias("n_hits"),
    )
    return per_q.select(
        "q_id",
        "n_truth",
        "n_retrieved",
        "n_hits",
        F.floor(F.col("n_hits") * 1000000 / F.col("n_truth")).cast("bigint").alias(
            "recall_ppm"
        ),
    )


def semantic_dedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication: assign every embedding to its nearest
    coarse-quantizer centroid (the IVF E-step) and keep ONE
    representative per cluster (min vec_id — deterministic), reporting
    how much the corpus shrinks and how label-pure each cluster is
    (majority label by count, ties to the smaller label id).

    This is the cluster-then-keep-one semantic dedup recipe (SemDeDup
    shape): at 100 TB the assignment is a broadcast-centroids map-side
    pass and the rollup two small keyed aggregates — nothing pairwise,
    unlike embedding-NN dedup which needs the blocked all-pairs kernel.
    """
    emb = _with_norm(_emb(spark, sf_dir))
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    assign = (
        emb.join(F.broadcast(cent))
        .withColumn(
            "c_cos",
            _dot(F.col("emb"), F.col("c_emb")) / (F.col("norm") * F.col("c_norm")),
        )
        .withColumn(
            "c_rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
            ),
        )
        .filter(F.col("c_rk") == 1)
        .select("vec_id", F.col("c_id").alias("bucket"), "label")
    )
    by_label = assign.groupBy("bucket", "label").agg(
        F.count("*").alias("n"), F.min("vec_id").alias("min_vid")
    )
    lrk = F.row_number().over(
        Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("label"))
    )
    return (
        by_label.withColumn("lrk", lrk)
        .groupBy("bucket")
        .agg(
            F.sum("n").alias("n_members"),
            (F.sum("n") - 1).alias("n_dropped"),
            F.min("min_vid").alias("rep_vec_id"),
            F.count("*").alias("n_labels"),
            F.max(F.when(F.col("lrk") == 1, F.col("label"))).alias(
                "majority_label"
            ),
            F.max(F.when(F.col("lrk") == 1, F.col("n"))).alias("majority_count"),
        )
    )


# --- distributed linear algebra: int8 Gram + PCA power iteration --------

INT8_MAX = 127
PCA_ITERS = 10


def _quantize_batch(pdf):
    """Per-vector symmetric int8 quantization, numpy-vectorized —
    bit-for-bit the embedding_quantize_error recipe (amax/127 scale,
    explicit half-up floor(x/s + 0.5)), so the SQL oracle can restate
    it exactly."""
    import numpy as np

    M = np.stack(pdf["emb"].values).astype(np.float64)
    amax = np.abs(M).max(axis=1)
    scale = np.where(amax == 0.0, 1.0, amax / INT8_MAX)
    return np.floor(M / scale[:, None] + 0.5).astype(np.int64)


def embedding_gram_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix (Xᵀ X) of the int8-quantized corpus — the covariance
    precursor every PCA / whitening / linear-probe step needs, and the
    quantized-matmul shape a GPU stage would run at 100 TB.

    Arrow-batched numpy matmul per partition (`mapInPandas`) emits
    64×64 int64 partials; one keyed aggregate merges them. Integer
    arithmetic makes the distributed sum ORDER-FREE — the result is
    bit-identical for any partitioning, so the DuckDB oracle can check
    an exact hash (a float Gram could not cross-check this way).
    Output: upper triangle (i ≤ j), 2080 rows regardless of corpus
    size — driver-safe at any scale."""
    from pyspark.sql.types import LongType, StructField, StructType

    # fan=False: the heavy work is numpy-vectorized inside mapInPandas
    # (not interpreted per-row), so fanning 2000 rows to 32 partitions
    # just multiplies the Arrow round-trips and the 2080-row partials
    # by 32 — measured ~2x slower isolated (guide §4.2 batch-size
    # caveat); at production scale the scan arrives multi-split anyway
    emb = _emb(spark, sf_dir, fan=False)

    def gram(batches):
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(DIM)
        for pdf in batches:
            if not len(pdf):
                continue
            q = _quantize_batch(pdf)
            G = q.T @ q
            yield pd.DataFrame(
                {"i": iu[0].astype("int64"), "j": iu[1].astype("int64"), "g": G[iu]}
            )

    schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("g", LongType()),
        ]
    )
    partials = emb.select("emb").mapInPandas(gram, schema=schema)
    # one merge pass regardless of partition count; at local scale the
    # _emb fan-out was measured SLOWER here (32 tiny Arrow batches ->
    # 32x 2080-row partials where numpy does the per-row work
    # vectorized anyway) — hence fan=False above
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def embedding_pca_eigensolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the corpus — the production big-data
    PCA split: the O(N·d²) Gram pass is distributed and integer-exact;
    the d×d eigensolve runs driver-side on 4096 scalars (O(d²) driver
    state, scale-invariant like the k-means M-step collect; power
    iteration is the wrong tool for the full eigenVECTOR here — this
    near-isotropic spectrum has no eigengap for it to exploit).

    Library-surface only (NOT in the driver ``QUERIES`` registry): a
    dense symmetric eigensolve is not SQL-expressible, so there is no
    DuckDB oracle to pair it with — the distributed part of the
    computation (the Gram) IS registered and hash-checked as
    ``embedding_gram_int8``, this eigensolve layer is pinned against a
    direct numpy eigendecomposition of the raw embeddings in
    `tests/test_timeseries_search.py`, and the driver-green companion
    ``embedding_pca_top`` pins integer spectral invariants of the SAME
    Gram relation cross-engine. Deterministic because the Gram is
    integer-exact and the solve is one driver-side LAPACK call."""
    import numpy as np

    gram_rows = embedding_gram_int8(spark, sf_dir).collect()
    G = np.zeros((DIM, DIM))
    for r in gram_rows:
        G[r["i"], r["j"]] = r["g"]
        G[r["j"], r["i"]] = r["g"]
    evals, evecs = np.linalg.eigh(G)
    eig, v = float(evals[-1]), evecs[:, -1]
    # sign convention: largest-magnitude loading is positive
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    rows = [
        (int(d), float(v[d]), eig, int(len(gram_rows)))
        for d in range(DIM)
    ]
    return spark.createDataFrame(
        rows, "dim_idx bigint, loading double, eigenvalue double, n_gram_cells bigint"
    )


PCA_U_SCALE = 1024  # 10-bit fixed-point for the power-iteration vector
PCA_FP = 1_000_000  # 6-digit fixed-point for the Rayleigh fraction


def embedding_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-green PCA contract (r6 verdict item 3): integer spectral
    invariants of the corpus Gram matrix that a SQL oracle CAN
    recompute, replacing the unregisterable eigenvector output of
    ``embedding_pca_eigensolve`` (which stays as the library/pytest
    surface for the actual loadings).

    From the exact int64 Gram G (the hash-checked
    ``embedding_gram_int8`` relation) this emits, all in EXACT integer
    / fixed-point arithmetic so both engines hash-match bit-for-bit:

    - ``trace_g`` = tr(G) = Σλ (total spectral mass);
    - ``frob_div_trace``/``frob_mod_trace`` = divmod(‖G‖_F², tr(G)) —
      ‖G‖_F² = Σλ² exceeds int64 at scale, so it is carried as an
      exact quotient+remainder pair against the trace;
    - ``rq0_fp6`` = 10⁶·(1ᵀG1)/d — the Rayleigh quotient of the
      all-ones start vector (λ_max lower bound);
    - one deterministic integer power-iteration step: v₁ = G·1 (exact
      row sums), normalized to the 10-bit fixed-point vector
      u = ⌊(v₁+m)·1024/m⌋ − 1024 with m = max(|v₁|, 1) — the shift
      keeps the divided quantity non-negative so truncating division
      IS floor division in both engines;
    - ``rq1_int``/``rq1_frac_fp6`` = the improved Rayleigh quotient
      uᵀGu / uᵀu as an integer part + 6-digit fixed-point fraction
      (G is PSD so both terms are non-negative — again trunc == floor).

    Scale: the Gram pass is the same distributed mapInPandas matmul as
    ``embedding_gram_int8`` (O(N·d²) work, 64×64 partials); everything
    downstream operates on the 4096-cell Gram relation — constant-size
    joins regardless of corpus size. Intermediates ride decimal(38,0)
    (u·g·u partials reach ~10²³ at sf1; headroom to ~10³⁵)."""
    dec = "decimal(38,0)"
    # i ≤ j triangle. Cache audit (r11): this relation is d(d+1)/2 ≤
    # 2,080 rows REGARDLESS of corpus size (the corpus-scale work is
    # the Gram pass that produces it), so the cached block is bounded —
    # not the corpus-scale CacheManager hazard the ivf caches were
    tri = embedding_gram_int8(spark, sf_dir).cache()
    mirror = tri.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), F.col("g")
    )
    full = tri.select("i", "j", "g").union(mirror)
    # r13 plan-shape rework (guide §2.4): the r12 form materialized six
    # scalar/vector sub-relations (v1, m, u×2, quad, den, scal) and
    # recombined them through five broadcast-join jobs — ~12 sequential
    # AQE stage-jobs for arithmetic on a 4,096-row relation. Every one
    # of those quantities is expressible ON the mirrored Gram relation
    # itself with three window passes (row sums by i, by j, and the
    # global max — the relation is d² = 4,096 rows at ANY corpus size,
    # so an unpartitioned window is bounded by construction), followed
    # by ONE aggregate: den/trace fold over the diagonal rows, num/frob
    # over all rows. Plan: 3 tiny exchanges + 1 aggregate, zero
    # broadcast builds (plan diff in plans/r13/). Every arithmetic
    # expression is unchanged token-for-token, so the integer/decimal
    # semantics — and the oracle hash — are identical.
    from pyspark.sql import Window

    w_i = Window.partitionBy("i")
    w_j = Window.partitionBy("j")
    w_all = Window.partitionBy()
    ann = (
        full.withColumn("w_i", F.sum("g").over(w_i))
        .withColumn("w_j", F.sum("g").over(w_j))
        .withColumn(
            "m",
            F.greatest(F.max(F.abs(F.col("w_i"))).over(w_all), F.lit(1)),
        )
        .selectExpr(
            "i",
            "j",
            "g",
            "m",
            f"CAST(((w_i + m) * {PCA_U_SCALE}) div m AS BIGINT)"
            f" - {PCA_U_SCALE} AS u_i",
            f"CAST(((w_j + m) * {PCA_U_SCALE}) div m AS BIGINT)"
            f" - {PCA_U_SCALE} AS u_j",
        )
    )
    diag = F.col("i") == F.col("j")
    row = ann.agg(
        F.sum(F.when(diag, F.col("g"))).alias("trace_g"),
        F.sum(F.col("g").cast(dec) * F.col("g")).alias("frob_sq"),
        F.sum(F.col("g").cast(dec)).alias("sum_all"),
        F.max("m").alias("m"),
        F.sum(F.when(diag, F.col("u_i") * F.col("u_i"))).alias("den"),
        F.sum(
            (F.col("u_i") * F.col("g")).cast(dec) * F.col("u_j")
        ).alias("num"),
    )
    return row.selectExpr(
        "CAST(trace_g AS BIGINT) AS trace_g",
        "CAST(frob_sq div trace_g AS BIGINT) AS frob_div_trace",
        "CAST(frob_sq % trace_g AS BIGINT) AS frob_mod_trace",
        f"CAST((sum_all * {PCA_FP}) div {DIM} AS BIGINT) AS rq0_fp6",
        "CAST(m AS BIGINT) AS v1_max_abs",
        "CAST(den AS BIGINT) AS u_norm_sq",
        "CAST(num div den AS BIGINT) AS rq1_int",
        f"CAST((CAST(num % den AS {dec}) * {PCA_FP}) div den AS BIGINT)"
        " AS rq1_frac_fp6",
    )


MRL_DIM = 16  # Matryoshka truncation prefix length
KC_CENTERS = 8  # current coreset: vec_id < 8
KC_FRONTIER = 5  # report the top-5 farthest candidates


def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: how much of the full-dimension
    top-K neighborhood survives when cosine runs on only the FIRST
    ``MRL_DIM`` dimensions — the measurement that decides whether a
    deployment can serve truncated (4× cheaper) embeddings, assuming
    MRL-style training packed meaning into the prefix. Reports
    recall@K of truncated-vs-full per query.

    Plan: ONE broadcast-join candidate scan computes both cosines
    (full fold and ``slice(emb, 1, 16)`` fold) per pair; two windowed
    top-Ks over the same relation; the overlap join is top-K×top-K per
    query — bounded. Same scale posture as ``similarity_topk``; the
    truncated path exists to CUT the fold cost at serving time.

    r13 quiet-host re-A/B: ``fan=False`` (0.33 vs 0.43 fanned) — the
    broadcast-probe candidate scan is too light for the exchange."""
    emb = _with_norm(_emb(spark, sf_dir, fan=False))
    t = F.slice(F.col("emb"), 1, MRL_DIM)
    both = emb.withColumn("temb", t).withColumn(
        "tnorm", F.sqrt(_dot(F.col("temb"), F.col("temb")))
    )
    q = both.select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("temb").alias("q_temb"),
        F.col("tnorm").alias("q_tnorm"),
    ).filter(F.col("q_id") < N_QUERIES)
    pairs = (
        both.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "c_full",
            _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")),
        )
        .withColumn(
            "c_trunc",
            _dot(F.col("q_temb"), F.col("temb"))
            / (F.col("q_tnorm") * F.col("tnorm")),
        )
    )
    w_full = Window.partitionBy("q_id").orderBy(F.desc("c_full"), F.asc("vec_id"))
    w_tr = Window.partitionBy("q_id").orderBy(F.desc("c_trunc"), F.asc("vec_id"))
    top_full = (
        pairs.withColumn("rk", F.row_number().over(w_full))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id")
    )
    top_tr = (
        pairs.withColumn("rk", F.row_number().over(w_tr))
        .filter(F.col("rk") <= TOP_K)
        .select(F.col("q_id").alias("tq_id"), F.col("vec_id").alias("tvec_id"))
    )
    hits = top_full.join(
        top_tr,
        (F.col("q_id") == F.col("tq_id")) & (F.col("vec_id") == F.col("tvec_id")),
        "left",
    )
    return hits.groupBy("q_id").agg(
        F.sum(F.when(F.col("tvec_id").isNotNull(), 1).otherwise(0)).alias(
            "n_overlap"
        ),
        F.round(
            F.sum(F.when(F.col("tvec_id").isNotNull(), 1).otherwise(0))
            / F.lit(float(TOP_K)),
            6,
        ).alias("recall6"),
    )


def coreset_kcenter_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One greedy k-center (farthest-point) selection step — the
    diversity-sampling primitive (coreset construction, facility
    location): given the current ``KC_CENTERS`` coreset, rank every
    remaining vector by its distance to the NEAREST center (cosine
    distance 1 − cos) and report the ``KC_FRONTIER`` farthest — the
    next points a diversity-maximizing curator would admit.

    Plan: broadcast the center slice (8 rows), one corpus scan fans
    out ×8, per-vector min fold, then a GLOBAL top-5 via orderBy+limit
    — Spark plans that as TakeOrderedAndProject (per-partition top-5 +
    driver merge of 5-row heaps), NOT a global sort; ordering is on
    full-precision distance with vec_id tie-break, output rounded.

    fan=False: both branches (centers + candidates) re-read the scan,
    so the fan-out doubles into TWO round-robin exchanges feeding a
    broadcast build and a per-partition heap — measured ~3x slower
    than the straight single-partition scan at local scale."""
    emb = _with_norm(_emb(spark, sf_dir, fan=False))
    cent = emb.filter(F.col("vec_id") < KC_CENTERS).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cand = emb.filter(F.col("vec_id") >= KC_CENTERS)
    d = F.lit(1.0) - _dot(F.col("emb"), F.col("c_emb")) / (
        F.col("norm") * F.col("c_norm")
    )
    per = (
        cand.join(F.broadcast(cent))
        .withColumn("dist", d)
        .groupBy("vec_id")
        .agg(F.min("dist").alias("min_dist"))
    )
    return (
        per.orderBy(F.desc("min_dist"), F.asc("vec_id"))
        .limit(KC_FRONTIER)
        .select("vec_id", F.round("min_dist", 6).alias("min_dist6"))
    )


PQ_M = 4  # product-quantization subspaces
PQ_K = 16  # centroids per subspace (codebook = vec_id < PQ_K)
PQ_FP = 1_000_000_000  # fixed-point scale for order-free SSE sums


def pq_codebook_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook audit — the compression step an
    ANN index (IVF-PQ) runs over every embedding: split each vector
    into {PQ_M} subvectors, assign each to its nearest of {PQ_K}
    codebook centroids (squared L2, centroid-id tie-break), and report
    per-(subspace, centroid) assignment counts and reconstruction
    error. Balanced counts and low MSE mean the codebook fits the
    corpus; empty cells mean wasted codes.

    The codebook is the deterministic seed used across this module's
    clustering ops: the PQ_K lowest vec_ids. Cross-row SSE uses the
    house fixed-point form (floor(d²·{PQ_FP}) summed as bigint —
    exact, order-free; a double sum would hash differently per
    partition order); the final MSE is one correctly-rounded division
    chain. Subspace width is ``dim div {PQ_M}`` so the operator is
    dimension-agnostic (trailing remainder dims excluded, both
    engines).

    Scale: vectors × (broadcast {PQ_M}·{PQ_K} codebook rows) — the
    same bounded-fanout shape as ``similarity_ivf_topk``; argmin via
    struct-min aggregation (no window over the corpus); output bounded
    by {PQ_M}·{PQ_K} cells."""
    base = _emb(spark, sf_dir).select(
        "vec_id",
        "emb",
        F.floor(F.size("emb") / PQ_M).cast("int").alias("subd"),
    )
    vecs = base.select(
        "vec_id",
        F.explode(F.array(*[F.lit(i) for i in range(PQ_M)])).alias("sub"),
        "emb",
        "subd",
    ).select(
        "vec_id",
        "sub",
        F.slice(
            F.col("emb"), F.col("sub") * F.col("subd") + 1, F.col("subd")
        ).alias("sv"),
    )
    cents = vecs.filter(F.col("vec_id") < PQ_K).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        vecs.join(F.broadcast(cents), "sub")
        .select("vec_id", "sub", F.struct(d2.alias("d2"), "cid").alias("s"))
        .groupBy("vec_id", "sub")
        .agg(F.min("s").alias("m"))
        .select("sub", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"))
    )
    return (
        best.groupBy("sub", "cid")
        .agg(
            F.count("*").alias("n_assigned"),
            F.sum(F.floor(F.col("d2") * PQ_FP).cast("bigint"))
            .cast("bigint")
            .alias("sse_fp"),
        )
        .withColumn(
            "mse6",
            F.round(
                (F.col("sse_fp").cast("double") / F.lit(float(PQ_FP)))
                / F.col("n_assigned"),
                6,
            ),
        )
    )


ADC_QUERIES = 5  # vec_id < 5 probe the compressed index
ADC_TOP_K = 3


def ivf_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ serving path — the complete compressed-domain ANN query:
    coarse-cell probe (IVF) + asymmetric distance computation (ADC)
    over PQ codes. This is how a 100 TB vector index actually answers
    queries: the scan touches {PQ_M}-byte codes, never full vectors —
    each query precomputes a {PQ_M}×{PQ_K} lookup table of
    subspace-to-centroid distances, and a candidate's distance is M
    integer table lookups summed, not a 64-dim float kernel.

    Determinism: subspace/coarse d² are the sequential zip_with folds
    shared with pq_codebook_audit (bit-identical to the oracle's
    list_reduce); LUT entries are fixed-point floor(d²·{PQ_FP}) BIGINTs
    so the per-candidate ADC sum is order-free exact; all ranks
    tie-break on ids.

    Scale shape: codes + cells are one broadcast-codebook map pass
    each (no shuffle); the LUT is Q×{PQ_M}×{PQ_K} rows (broadcast);
    candidates flow through ONE equi-join on the probed cell key
    (∝ n·nprobe/{IVF_CENTROIDS} rows per query, never n); the ADC fold
    is a broadcast LUT join + integer hash-aggregate. No window ever
    sees the corpus — only the per-query top-k over candidates.

    Plan note: of the 6 parquet scans, 4 are pushdown-pruned to
    ≤ IVF_CENTROIDS rows (centroid/query slices — PLANS.md); the two
    corpus-sized scans build ``codes`` and ``cells``, which a
    production index persists ONCE and re-reads per query batch — the
    per-query cost is the code-table scan alone ({PQ_M} bytes/vector),
    which is the entire point of PQ."""
    # r13 quiet-host re-A/B: fan=False (0.85 vs 1.04 fanned) — both
    # corpus-sized consumers aggregate immediately, so the exchange
    # outweighs the spread folds
    base = _emb(spark, sf_dir, fan=False).select(
        "vec_id",
        "emb",
        F.floor(F.size("emb") / PQ_M).cast("int").alias("subd"),
    )
    subs = base.select(
        "vec_id",
        F.explode(F.array(*[F.lit(i) for i in range(PQ_M)])).alias("sub"),
        "emb",
        "subd",
    ).select(
        "vec_id",
        "sub",
        F.slice(
            F.col("emb"), F.col("sub") * F.col("subd") + 1, F.col("subd")
        ).alias("sv"),
    )
    cents = subs.filter(F.col("vec_id") < PQ_K).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    code_pairs = subs.join(F.broadcast(cents), "sub").select(
        "vec_id", "sub", "cid", d2.alias("d2")
    )
    codes = (
        code_pairs.select(
            "vec_id",
            "sub",
            F.struct(F.col("d2"), F.col("cid")).alias("s"),
        )
        .groupBy("vec_id", "sub")
        .agg(F.min("s").alias("m"))
        .select("vec_id", "sub", F.col("m.cid").alias("code"))
    )
    # coarse quantizer: full-vector squared L2 to the IVF seed vectors
    coarse = base.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cell_id"), F.col("emb").alias("c_emb")
    )
    cd2 = F.aggregate(
        F.zip_with("emb", "c_emb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cell_pairs = base.join(F.broadcast(coarse)).select(
        "vec_id", "cell_id", cd2.alias("d2")
    )
    cells = (
        cell_pairs.select(
            "vec_id", F.struct(F.col("d2"), F.col("cell_id")).alias("s")
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("m"))
        .select("vec_id", F.col("m.cell_id").alias("cell"))
    )
    probes = (
        cell_pairs.filter(F.col("vec_id") < ADC_QUERIES)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d2", "cell_id")
            ),
        )
        .filter(F.col("rk") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("q_id"), F.col("cell_id").alias("cell"))
    )
    lut = code_pairs.filter(F.col("vec_id") < ADC_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        "sub",
        F.col("cid").alias("code"),
        F.floor(F.col("d2") * PQ_FP).cast("bigint").alias("lut_fp"),
    )
    cand = probes.join(cells, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("lut_fp").alias("adc_fp"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_fp", "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ADC_TOP_K)
        .select(
            "q_id",
            "rk",
            "vec_id",
            "adc_fp",
            F.round(
                F.col("adc_fp").cast("double") / F.lit(float(PQ_FP)), 6
            ).alias("adc6"),
        )
    )


QUERIES = {
    "embedding_gram_int8": embedding_gram_int8,
    "pq_codebook_audit": pq_codebook_audit,
    "ivf_pq_adc_topk": ivf_pq_adc_topk,
    "matryoshka_truncation_audit": matryoshka_truncation_audit,
    "coreset_kcenter_step": coreset_kcenter_step,
    # embedding_pca_top: registered r7 as integer spectral invariants
    # (trace / Frobenius divmod / fixed-point Rayleigh quotients) of
    # the same Gram relation; the eigenVECTOR solve itself stays
    # library-only as embedding_pca_eigensolve (no SQL oracle exists
    # for a dense symmetric eigensolve).
    "embedding_pca_top": embedding_pca_top,
    "similarity_topk": similarity_topk,
    "kmeans_update_step": kmeans_update_step,
    "similarity_lsh_buckets": similarity_lsh_buckets,
    "similarity_ivf_topk": similarity_ivf_topk,
    "dedup_embedding_nearest": dedup_embedding_nearest,
    "similarity_recall_eval": similarity_recall_eval,
    "semantic_dedup_reps": semantic_dedup_reps,
}


# --- oracle SQL ---------------------------------------------------------

_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, 64), i -> {a}[i] * {b}[i])), "
    "(acc, v) -> acc + v)"
)
_TDOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, 16), i -> {a}[i] * {b}[i])), "
    "(acc, v) -> acc + v)"
)
_NORM = f"sqrt({_DOT.format(a='{a}', b='{a}')})"

_PLANE_COEFF = "(({A} * i + {B}) % 61 - 30)"
_BUCKET = "CAST(" + " + ".join(
    f"CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    f"list_transform(generate_series(1, 64), "
    f"i -> emb[i] * CAST({_PLANE_COEFF.format(A=A[j], B=B[j])} AS DOUBLE))), "
    f"(acc, v) -> acc + v) > 0 THEN {2**j} ELSE 0 END"
    for j in range(LSH_PLANES)
) + " AS BIGINT)"

_EMB_CTE = f"""
    WITH e AS (
        SELECT vec_id, {_EMB_D} AS emb FROM embeddings
    ),
    en AS (
        SELECT vec_id, emb, {_NORM.format(a='emb')} AS norm FROM e
    )
"""

ORACLE = {
    "matryoshka_truncation_audit": f"""
        {_EMB_CTE},
        et AS (
            SELECT vec_id, emb, norm, emb[1:16] AS temb,
                   sqrt({_TDOT.format(a='emb[1:16]', b='emb[1:16]')}) AS tnorm
            FROM en
        ),
        pairs AS (
            SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                   {_DOT.format(a='q.emb', b='c.emb')} / (q.norm * c.norm)
                       AS c_full,
                   {_TDOT.format(a='q.temb', b='c.temb')} / (q.tnorm * c.tnorm)
                       AS c_trunc
            FROM et q JOIN et c
              ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ),
        top_full AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id, row_number() OVER (
                    PARTITION BY q_id ORDER BY c_full DESC, vec_id) AS rk
                FROM pairs) WHERE rk <= {TOP_K}
        ),
        top_tr AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id, row_number() OVER (
                    PARTITION BY q_id ORDER BY c_trunc DESC, vec_id) AS rk
                FROM pairs) WHERE rk <= {TOP_K}
        )
        SELECT f.q_id,
               CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlap,
               round(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     / {float(TOP_K)}, 6) AS recall6
        FROM top_full f
        LEFT JOIN top_tr t ON f.q_id = t.q_id AND f.vec_id = t.vec_id
        GROUP BY f.q_id
    """,
    "coreset_kcenter_step": f"""
        {_EMB_CTE}
        SELECT vec_id, round(min_dist, 6) AS min_dist6 FROM (
            SELECT v.vec_id,
                   min(1.0 - {_DOT.format(a='v.emb', b='c.emb')}
                             / (v.norm * c.norm)) AS min_dist
            FROM en v JOIN en c
              ON v.vec_id >= {KC_CENTERS} AND c.vec_id < {KC_CENTERS}
            GROUP BY v.vec_id
        )
        ORDER BY min_dist DESC, vec_id LIMIT {KC_FRONTIER}
    """,
    "similarity_topk": f"""
        {_EMB_CTE}
        SELECT q_id, vec_id, round(c, 6) AS cos_sim, rk FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                   {_DOT.format(a='q.emb', b='c.emb')} / (q.norm * c.norm) AS c,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_DOT.format(a='q.emb', b='c.emb')} / (q.norm * c.norm) DESC,
                                c.vec_id ASC) AS rk
            FROM en q JOIN en c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ) WHERE rk <= {TOP_K}
    """,
    "similarity_lsh_buckets": f"""
        {_EMB_CTE},
        eb AS (SELECT vec_id, emb, norm, {_BUCKET} AS bucket FROM en)
        SELECT q_id, vec_id, round(c, 6) AS cos_sim, rk FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                   {_DOT.format(a='q.emb', b='c.emb')} / (q.norm * c.norm) AS c,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_DOT.format(a='q.emb', b='c.emb')} / (q.norm * c.norm) DESC,
                                c.vec_id ASC) AS rk
            FROM eb q JOIN eb c ON q.bucket = c.bucket
             AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ) WHERE rk <= {LSH_TOP_K}
    """,
    "similarity_ivf_topk": f"""
        {_EMB_CTE},
        cent AS (
            SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
            FROM en WHERE vec_id < {IVF_CENTROIDS}
        ),
        scored_cent AS (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_DOT.format(a='e.emb', b='c.c_emb')} / (e.norm * c.c_norm) DESC,
                                c.c_id ASC) AS c_rk
            FROM en e CROSS JOIN cent c
        ),
        assign AS (
            SELECT vec_id, c_id AS bucket FROM scored_cent WHERE c_rk = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, c_id AS probe
            FROM scored_cent WHERE vec_id < {N_QUERIES} AND c_rk <= {IVF_NPROBE}
        )
        SELECT q_id, vec_id, round(c, 6) AS cos_sim, rk FROM (
            SELECT p.q_id, a.vec_id,
                   {_DOT.format(a='q.emb', b='e.emb')} / (q.norm * e.norm) AS c,
                   row_number() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {_DOT.format(a='q.emb', b='e.emb')} / (q.norm * e.norm) DESC,
                                a.vec_id ASC) AS rk
            FROM probes p
            JOIN assign a ON a.bucket = p.probe AND a.vec_id <> p.q_id
            JOIN en e ON e.vec_id = a.vec_id
            JOIN en q ON q.vec_id = p.q_id
        ) WHERE rk <= {IVF_TOP_K}
    """,
    "kmeans_update_step": f"""
        {_EMB_CTE},
        cent AS (
            SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
            FROM en WHERE vec_id < {IVF_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, c_id AS bucket FROM (
                SELECT e.vec_id, c.c_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_DOT.format(a='e.emb', b='c.c_emb')} / (e.norm * c.c_norm) DESC,
                                    c.c_id ASC) AS c_rk
                FROM en e CROSS JOIN cent c
            ) WHERE c_rk = 1
        ),
        ex AS (
            SELECT a.bucket, e.vec_id, i - 1 AS pos, e.emb[i] AS x
            FROM assign a
            JOIN en e ON e.vec_id = a.vec_id,
            generate_series(1, 64) t(i)
        )
        SELECT bucket, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(x ORDER BY vec_id)),
                           (acc, v) -> acc + v) / count(*) AS centroid_val,
               count(*) AS n_members
        FROM ex GROUP BY bucket, pos
    """,
    "dedup_embedding_nearest": f"""
        {_EMB_CTE},
        pairs AS (
            SELECT a.vec_id, b.vec_id AS o_id,
                   {_DOT.format(a='a.emb', b='b.emb')} / (a.norm * b.norm) AS c
            FROM en a JOIN en b ON a.vec_id < b.vec_id
        ),
        sym AS (
            SELECT vec_id, o_id, c FROM pairs
            UNION ALL
            SELECT o_id AS vec_id, vec_id AS o_id, c FROM pairs
        )
        SELECT vec_id, o_id AS nearest_id, round(c, 6) AS cos_sim,
               c >= 0.95 AS is_near_dup
        FROM (
            SELECT vec_id, o_id, c,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY c DESC, o_id ASC) AS rk
            FROM sym
        ) WHERE rk = 1
    """,
}

# recall oracle composes the two audited oracles verbatim as derived
# tables (DuckDB supports WITH inside a subquery), so ground truth and
# ANN results can never drift from what the standalone queries return
ORACLE["similarity_recall_eval"] = f"""
    WITH truth AS (
        SELECT q_id, vec_id, 1 AS in_truth
        FROM ({ORACLE["similarity_topk"]}) t
        WHERE rk <= {IVF_TOP_K}
    ),
    approx AS (
        SELECT q_id, vec_id, 1 AS in_approx
        FROM ({ORACLE["similarity_ivf_topk"]}) a
    ),
    j AS (
        SELECT q_id, vec_id, in_truth, in_approx
        FROM truth FULL OUTER JOIN approx USING (q_id, vec_id)
    )
    SELECT q_id,
           CAST(sum(in_truth) AS BIGINT) AS n_truth,
           CAST(sum(in_approx) AS BIGINT) AS n_retrieved,
           CAST(sum(CASE WHEN in_truth IS NOT NULL
                          AND in_approx IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(floor(
               sum(CASE WHEN in_truth IS NOT NULL
                         AND in_approx IS NOT NULL
                        THEN 1 ELSE 0 END) * 1000000
               / sum(in_truth)) AS BIGINT) AS recall_ppm
    FROM j GROUP BY q_id
"""

ORACLE["semantic_dedup_reps"] = f"""
    {_EMB_CTE},
    cent AS (
        SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
        FROM en WHERE vec_id < {IVF_CENTROIDS}
    ),
    assign AS (
        SELECT vec_id, bucket, label FROM (
            SELECT e.vec_id, c.c_id AS bucket, em.label,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_DOT.format(a='e.emb', b='c.c_emb')}
                                / (e.norm * c.c_norm) DESC,
                                c.c_id ASC) AS c_rk
            FROM en e
            JOIN embeddings em ON em.vec_id = e.vec_id
            CROSS JOIN cent c
        ) WHERE c_rk = 1
    ),
    by_label AS (
        SELECT bucket, label, count(*) AS n, min(vec_id) AS min_vid
        FROM assign GROUP BY bucket, label
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY bucket ORDER BY n DESC, label ASC) AS lrk
        FROM by_label
    )
    SELECT bucket,
           CAST(sum(n) AS BIGINT) AS n_members,
           CAST(sum(n) - 1 AS BIGINT) AS n_dropped,
           min(min_vid) AS rep_vec_id,
           count(*) AS n_labels,
           max(CASE WHEN lrk = 1 THEN label END) AS majority_label,
           CAST(max(CASE WHEN lrk = 1 THEN n END) AS BIGINT) AS majority_count
    FROM ranked GROUP BY bucket
"""

ORACLE["embedding_gram_int8"] = """
    WITH xd AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
        FROM embeddings
    ),
    sc AS (
        SELECT vec_id, x,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform(x, v -> abs(v))),
                   (a, b) -> greatest(a, b)
               ) AS amax
        FROM xd
    ),
    qv AS (
        SELECT vec_id,
               list_transform(
                   x,
                   v -> CAST(floor(v / (CASE WHEN amax = 0.0 THEN 1.0
                                             ELSE amax / 127 END)
                                   + 0.5) AS BIGINT)
               ) AS q
        FROM sc
    ),
    dims AS (SELECT unnest(generate_series(0, 63)) AS i)
    SELECT d1.i AS i, d2.i AS j,
           CAST(sum(q[d1.i + 1] * q[d2.i + 1]) AS BIGINT) AS g
    FROM qv, dims d1, dims d2
    WHERE d2.i >= d1.i
    GROUP BY d1.i, d2.i
"""

# Spectral invariants restated over the SAME Gram SQL (reused as a
# CTE): exact integer trace / Frobenius divmod / fixed-point Rayleigh
# quotients. HUGEINT carries what exceeds int64; every division is a
# non-negative truncating `//` (== floor, mirroring Spark's `div` on
# the shifted non-negative operands).
ORACLE["embedding_pca_top"] = f"""
    WITH gram AS ({ORACLE["embedding_gram_int8"]}),
    fullg AS (
        SELECT i, j, g FROM gram
        UNION ALL
        SELECT j AS i, i AS j, g FROM gram WHERE i <> j
    ),
    v1 AS (SELECT i, CAST(sum(g) AS BIGINT) AS w FROM fullg GROUP BY i),
    mm AS (
        SELECT greatest(CAST(max(abs(w)) AS BIGINT), 1) AS m FROM v1
    ),
    u AS (
        SELECT i, ((w + m) * {PCA_U_SCALE}) // m - {PCA_U_SCALE} AS u
        FROM v1, mm
    ),
    quad AS (
        SELECT CAST(sum(CAST(ui.u AS HUGEINT) * fg.g * uj.u) AS HUGEINT)
                   AS num
        FROM fullg fg
        JOIN u ui ON ui.i = fg.i
        JOIN u uj ON uj.i = fg.j
    ),
    dd AS (SELECT CAST(sum(u * u) AS BIGINT) AS den FROM u),
    scal AS (
        SELECT CAST(sum(CASE WHEN i = j THEN g END) AS BIGINT) AS trace_g,
               CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS frob_sq,
               CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sum_all
        FROM fullg
    )
    SELECT trace_g,
           CAST(frob_sq // trace_g AS BIGINT) AS frob_div_trace,
           CAST(frob_sq % trace_g AS BIGINT) AS frob_mod_trace,
           CAST((sum_all * {PCA_FP}) // {DIM} AS BIGINT) AS rq0_fp6,
           CAST(m AS BIGINT) AS v1_max_abs,
           den AS u_norm_sq,
           CAST(num // den AS BIGINT) AS rq1_int,
           CAST((CAST(num % den AS HUGEINT) * {PCA_FP}) // den AS BIGINT)
               AS rq1_frac_fp6
    FROM scal, mm, quad, dd
"""

ORACLE["pq_codebook_audit"] = f"""
    WITH base AS (
        SELECT vec_id, {_EMB_D} AS emb,
               CAST(len(embedding) // {PQ_M} AS INT) AS subd
        FROM embeddings
    ),
    vecs AS (
        SELECT vec_id, CAST(m.sub AS INT) AS sub,
               emb[(m.sub * subd + 1):(m.sub * subd + subd)] AS sv
        FROM base, (SELECT unnest(range({PQ_M})) AS sub) m
    ),
    cents AS (
        SELECT sub, vec_id AS cid, sv AS cv FROM vecs
        WHERE vec_id < {PQ_K}
    ),
    pairs AS (
        SELECT v.vec_id, v.sub, c.cid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(v.sv)),
                       i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]))),
                   (acc, x) -> acc + x) AS d2
        FROM vecs v JOIN cents c ON v.sub = c.sub
    ),
    best AS (
        SELECT sub, cid, d2 FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d2, cid) AS rn
            FROM pairs
        ) WHERE rn = 1
    ),
    cells AS (
        SELECT sub, cid, count(*) AS n_assigned,
               CAST(sum(CAST(floor(d2 * {PQ_FP}) AS BIGINT)) AS BIGINT)
                   AS sse_fp
        FROM best GROUP BY 1, 2
    )
    SELECT sub, cid, n_assigned, sse_fp,
           round((CAST(sse_fp AS DOUBLE) / {PQ_FP}.0) / n_assigned, 6)
               AS mse6
    FROM cells
"""

ORACLE["ivf_pq_adc_topk"] = f"""
    WITH base AS (
        SELECT vec_id, {_EMB_D} AS emb,
               CAST(len(embedding) // {PQ_M} AS INT) AS subd
        FROM embeddings
    ),
    subs AS (
        SELECT vec_id, CAST(m.sub AS INT) AS sub,
               emb[(m.sub * subd + 1):(m.sub * subd + subd)] AS sv
        FROM base, (SELECT unnest(range({PQ_M})) AS sub) m
    ),
    cents AS (
        SELECT sub, vec_id AS cid, sv AS cv FROM subs
        WHERE vec_id < {PQ_K}
    ),
    code_pairs AS (
        SELECT v.vec_id, v.sub, c.cid,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(v.sv)),
                       i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]))),
                   (acc, x) -> acc + x) AS d2
        FROM subs v JOIN cents c ON v.sub = c.sub
    ),
    codes AS (
        SELECT vec_id, sub, cid AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d2, cid) AS rn
            FROM code_pairs
        ) WHERE rn = 1
    ),
    coarse AS (
        SELECT vec_id AS cell_id, emb AS c_emb FROM base
        WHERE vec_id < {IVF_CENTROIDS}
    ),
    cell_pairs AS (
        SELECT b.vec_id, k.cell_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, len(b.emb)),
                       i -> (b.emb[i] - k.c_emb[i])
                            * (b.emb[i] - k.c_emb[i]))),
                   (acc, x) -> acc + x) AS d2
        FROM base b, coarse k
    ),
    cells AS (
        SELECT vec_id, cell_id AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, cell_id) AS rn
            FROM cell_pairs
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS q_id, cell_id AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, cell_id) AS rn
            FROM cell_pairs WHERE vec_id < {ADC_QUERIES}
        ) WHERE rn <= {IVF_NPROBE}
    ),
    lut AS (
        SELECT vec_id AS q_id, sub, cid AS code,
               CAST(floor(d2 * {PQ_FP}) AS BIGINT) AS lut_fp
        FROM code_pairs WHERE vec_id < {ADC_QUERIES}
    ),
    scored AS (
        SELECT p.q_id, c.vec_id,
               CAST(sum(l.lut_fp) AS BIGINT) AS adc_fp
        FROM probes p
        JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id
        JOIN codes d ON d.vec_id = c.vec_id
        JOIN lut l ON l.q_id = p.q_id AND l.sub = d.sub
                  AND l.code = d.code
        GROUP BY p.q_id, c.vec_id
    )
    SELECT q_id, rk, vec_id, adc_fp,
           round(CAST(adc_fp AS DOUBLE) / {PQ_FP}.0, 6) AS adc6
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adc_fp, vec_id) AS rk
        FROM scored
    ) WHERE rk <= {ADC_TOP_K}
"""


# --- r7-staged, registered at round 8: ranking-quality eval (MRR) ---------------------
# (registered at the round-8 merge; see the module-end merge block)


def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank audit of the IVF ANN path — the ranking
    twin of ``similarity_recall_eval``: per query, the brute-force
    nearest neighbor (rank 1 of ``similarity_topk``, the relevance
    ground truth) is looked up in the IVF top-{IVF_TOP_K} list; its
    reciprocal rank in exact ppm (floor(10^6 / rank), 0 on a miss) is
    the per-query score a serving team averages into MRR.

    Both sides reuse the registered operators verbatim (same
    tie-breaks), so this composes two already-hash-verified plans with
    one O(Q) left join — at 100 TB the eval set is a sampled query
    slice and this audit's own cost is negligible next to either
    retrieval pass."""
    truth1 = (
        similarity_topk(spark, sf_dir)
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("vec_id").alias("rel_vec"))
    )
    approx = similarity_ivf_topk(spark, sf_dir).select(
        "q_id", F.col("vec_id").alias("rel_vec"), F.col("rk").alias("rank_in_approx")
    )
    j = truth1.join(approx, ["q_id", "rel_vec"], "left")
    return j.select(
        "q_id",
        "rel_vec",
        F.col("rank_in_approx").isNotNull().alias("found"),
        F.col("rank_in_approx").cast("long").alias("rank_in_approx"),
        F.coalesce(
            F.floor(F.lit(1000000.0) / F.col("rank_in_approx")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("rr_ppm"),
    )


QUERIES_R8 = {
    "retrieval_mrr_eval": retrieval_mrr_eval,
}

ORACLE_R8 = {
    "retrieval_mrr_eval": f"""
        WITH truth1 AS (
            SELECT q_id, vec_id AS rel_vec
            FROM ({ORACLE["similarity_topk"]}) t
            WHERE rk = 1
        ),
        approx AS (
            SELECT q_id, vec_id AS rel_vec, rk AS rank_in_approx
            FROM ({ORACLE["similarity_ivf_topk"]}) a
        )
        SELECT t.q_id,
               t.rel_vec,
               a.rank_in_approx IS NOT NULL AS found,
               CAST(a.rank_in_approx AS BIGINT) AS rank_in_approx,
               coalesce(CAST(floor(1000000.0 / a.rank_in_approx) AS BIGINT),
                        0) AS rr_ppm
        FROM truth1 t
        LEFT JOIN approx a ON a.q_id = t.q_id AND a.rel_vec = t.rel_vec
    """,
}


# --- round-8 merge (VERDICT r7 task 1) ----------------------------------
# The r7 registration freeze is over: every staged QUERIES_R8/ORACLE_R8
# entry joins the registered driver surface and earns CORRECTNESS rows
# like any other query. The staged dicts are deleted so
# registry.staged_queries() reports an empty staging area.
QUERIES.update(QUERIES_R8)
ORACLE.update(ORACLE_R8)
del QUERIES_R8, ORACLE_R8


# --- round 8: k-center coreset (Gonzalez greedy) -------------------------

CORESET_K = 8  # centers selected; K scans, one O(1) driver row each


def coreset_kcenter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset over the embedding table: Gonzalez's greedy
    k-center (the classic 2-approximation, public literature) —
    repeatedly select the vector FARTHEST (cosine distance) from the
    already-selected set. The selected ids are the maximally-diverse
    K-subset a curation team uses to seed labeling, eval slices, or
    cluster initialization, and each step's ``radius`` (the chosen
    vector's distance to the prior set) is a certified coverage bound:
    after k centers every vector is within radius_k of some center.

    Plan shape (the kmeans-r8 discipline): centers are O(1) driver
    rows, so each round's min-distance is an IN-ROW chained least()
    over literal center arrays — no join, no window, no shuffle; the
    argmax is a TakeOrdered(1) over one scan. K rounds = K scans of a
    cached projection with 1 collected row each (the same O(1)-per-
    round driver discipline as ``dedup_components`` / BPE training).
    Distances are the bit-exact sequential-fold dot products shared
    with the rest of the family, so the DuckDB oracle replays the
    greedy trajectory exactly — including ties, broken (distance DESC,
    vec_id ASC)."""
    # construction-scoped cache: the K greedy scans below all collect
    # during THIS function call and the returned relation is literal
    # driver rows, so the cache is fully consumed before return —
    # unpersisted in the finally (ADVICE/VERDICT r10 cache audit)
    emb = (
        _with_norm(_emb(spark, sf_dir))
        .select("vec_id", "emb", "norm")
        .cache()
    )
    try:
        return _coreset_greedy(spark, emb)
    finally:
        emb.unpersist()


def _coreset_greedy(spark: SparkSession, emb: DataFrame) -> DataFrame:
    first_rows = emb.orderBy("vec_id").limit(1).collect()
    if not first_rows:
        return spark.createDataFrame(
            [], "step int, center_vec_id long, radius double"
        )
    first = first_rows[0]
    out = [(0, int(first["vec_id"]), 0.0)]
    sel = [(int(first["vec_id"]), list(first["emb"]), float(first["norm"]))]
    for step in range(1, CORESET_K):
        mind = None
        for _id, c_emb, c_norm in sel:
            dist = F.lit(1.0) - _dot(
                F.col("emb"), F.array(*[F.lit(float(x)) for x in c_emb])
            ) / (F.col("norm") * F.lit(c_norm))
            mind = dist if mind is None else F.least(mind, dist)
        far = (
            emb.filter(~F.col("vec_id").isin([s[0] for s in sel]))
            .select("vec_id", "emb", "norm", mind.alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not far:
            break
        r = far[0]
        out.append((step, int(r["vec_id"]), float(r["d"])))
        sel.append((int(r["vec_id"]), list(r["emb"]), float(r["norm"])))
    return spark.createDataFrame(
        out, "step int, center_vec_id long, radius double"
    )


QUERIES["coreset_kcenter_sample"] = coreset_kcenter_sample


def _coreset_oracle_sql() -> str:
    dot_ec = _DOT.format(a="e.emb", b="c.emb")
    ctes = [
        "c0 AS (SELECT vec_id, emb, norm FROM en "
        "WHERE vec_id = (SELECT min(vec_id) FROM en))",
        f"""d1 AS (
            SELECT e.vec_id, e.emb, e.norm,
                   1 - {dot_ec} / (e.norm * c.norm) AS d
            FROM en e, c0 c
        )""",
    ]
    for k in range(1, CORESET_K):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM c{j}" for j in range(k)
        )
        ctes.append(
            f"""c{k} AS (
            SELECT vec_id, emb, norm, d FROM d{k}
            WHERE vec_id NOT IN ({prior})
            ORDER BY d DESC, vec_id ASC LIMIT 1
        )"""
        )
        if k < CORESET_K - 1:
            ctes.append(
                f"""d{k + 1} AS (
                SELECT e.vec_id, e.emb, e.norm,
                       least(e.d, 1 - {dot_ec} / (e.norm * c.norm)) AS d
                FROM d{k} e, c{k} c
            )"""
            )
    selects = [
        "SELECT 0 AS step, vec_id AS center_vec_id, "
        "CAST(0.0 AS DOUBLE) AS radius FROM c0"
    ] + [
        f"SELECT {k} AS step, vec_id AS center_vec_id, d AS radius FROM c{k}"
        for k in range(1, CORESET_K)
    ]
    return _EMB_CTE + ",\n" + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)


ORACLE["coreset_kcenter_sample"] = _coreset_oracle_sql()


# --- round 9: IVF probe sweep (the nprobe tuning curve) -------------------

IVF_SWEEP = (1, 2, 4, 8)  # nprobe values swept (max ≤ IVF_CENTROIDS)


def ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe tuning curve — recall@{IVF_TOP_K} AND candidate cost
    of the IVF ANN path at nprobe ∈ {IVF_SWEEP}, against brute-force
    ground truth, in ONE query. ``similarity_recall_eval`` grades the
    shipped operating point (nprobe = {IVF_NPROBE}); this is the sweep
    that CHOOSES it — the recall/cost frontier every ANN deployment
    walks before fixing its index parameters, and the sweep-family
    sibling of ``filter_survival_sweep``.

    One centroid-scoring pass serves every sweep point: each candidate
    reaches a query through exactly ONE bucket (its assignment), so the
    probe RANK of that bucket in the query's centroid ordering is the
    smallest nprobe at which the candidate appears — candidates are
    scored once with that rank attached, then a 4-value explode
    replays the ranking per sweep point. No per-nprobe rescans of the
    corpus; at 100 TB the added cost over a single-nprobe query is the
    (bounded) candidate relation × |sweep| through one window.

    Integer contract: recall is floor-div ppm of hits over the true
    top-{IVF_TOP_K} mass; candidate counts are exact. The referee pins
    recall monotone non-decreasing and cost strictly increasing in
    nprobe.

    Persistence (r11, ADVICE/VERDICT r10): the three shared relations
    (scored_cent — 16×n rows, cand, truth) ride
    ``localCheckpoint(eager=True)`` instead of ``.cache()``. Cached
    plans sit in the session CacheManager behind a STRONG reference
    and outlive the query until an explicit unpersist/clearCache — in
    a 244-query back-to-back sweep those corpus-sized blocks
    accumulate until LRU thrashing. Checkpoint blocks are held only by
    the DataFrame itself, so the ContextCleaner frees them as soon as
    the query's handles are garbage-collected: lifetime is bounded by
    the query, which is the contract. Timed work is identical (warm
    cache reads ≈ checkpoint reads); the plan-shape referee audits the
    fully-lazy twin via ``persist=False``."""
    return _ivf_probe_sweep_build(spark, sf_dir, persist=True)


def _ivf_probe_sweep_build(
    spark: SparkSession, sf_dir: str, persist: bool
) -> DataFrame:
    def hold(df: DataFrame) -> DataFrame:
        return df.transform(pin) if persist else df

    emb = _with_norm(_emb(spark, sf_dir))
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored_cent = (
        emb.join(F.broadcast(cent))
        .withColumn(
            "c_cos",
            _dot(F.col("emb"), F.col("c_emb"))
            / (F.col("norm") * F.col("c_norm")),
        )
        .withColumn(
            "c_rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("c_cos"), F.asc("c_id")
                )
            ),
        )
        .select("vec_id", "c_id", "c_rk")
        .transform(hold)
    )
    assign = scored_cent.filter(F.col("c_rk") == 1).select(
        "vec_id", F.col("c_id").alias("bucket")
    )
    probes = scored_cent.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("c_rk") <= max(IVF_SWEEP))
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("c_id").alias("probe"),
        F.col("c_rk").alias("probe_rank"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qv_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cand = (
        probes.join(assign, F.col("bucket") == F.col("probe"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(emb, "vec_id")
        .join(F.broadcast(q), F.col("q_id") == F.col("qv_id"))
        .select(
            "q_id",
            "vec_id",
            "probe_rank",
            (
                _dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_norm") * F.col("norm"))
            ).alias("cos_raw"),
        )
        # two consumers (cost counts + the ranking) — materialize the
        # bounded candidate relation so the probe join runs once, not
        # per branch (checkpoint, not cache: lifetime = this query)
        .transform(hold)
    )
    swept = cand.withColumn(
        "nprobe",
        F.explode(F.array(*[F.lit(p).cast("long") for p in IVF_SWEEP])),
    ).filter(F.col("probe_rank") <= F.col("nprobe"))
    counts = swept.groupBy("nprobe").agg(
        F.count("*").alias("n_candidates"),
        F.countDistinct("q_id").alias("n_queries_hit"),
    )
    topk = (
        swept.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("nprobe", "q_id").orderBy(
                    F.desc("cos_raw"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("nprobe", "q_id", "vec_id")
    )
    truth = (
        similarity_topk(spark, sf_dir)
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("q_id", "vec_id")
        .transform(hold)
    )
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    hits = topk.join(truth, ["q_id", "vec_id"]).groupBy("nprobe").agg(
        F.count("*").alias("n_hits")
    )
    return (
        counts.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "nprobe",
            "n_queries_hit",
            "n_candidates",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_truth",
            F.expr(
                "coalesce(n_hits, 0) * 1000000 div n_truth"
            ).alias("recall_ppm"),
        )
    )


QUERIES["ivf_probe_sweep"] = ivf_probe_sweep

ORACLE["ivf_probe_sweep"] = f"""
    {_EMB_CTE},
    cent AS (
        SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
        FROM en WHERE vec_id < {IVF_CENTROIDS}
    ),
    scored_cent AS (
        SELECT e.vec_id, c.c_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DOT.format(a='e.emb', b='c.c_emb')}
                            / (e.norm * c.c_norm) DESC,
                            c.c_id ASC) AS c_rk
        FROM en e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, c_id AS bucket FROM scored_cent WHERE c_rk = 1
    ),
    probes AS (
        SELECT vec_id AS q_id, c_id AS probe, c_rk AS probe_rank
        FROM scored_cent
        WHERE vec_id < {N_QUERIES} AND c_rk <= {max(IVF_SWEEP)}
    ),
    cand AS (
        SELECT p.q_id, a.vec_id, p.probe_rank,
               {_DOT.format(a='q.emb', b='e.emb')} / (q.norm * e.norm)
                   AS cos_raw
        FROM probes p
        JOIN assign a ON a.bucket = p.probe AND a.vec_id <> p.q_id
        JOIN en e ON e.vec_id = a.vec_id
        JOIN en q ON q.vec_id = p.q_id
    ),
    swept AS (
        SELECT s.nprobe, c.q_id, c.vec_id, c.cos_raw
        FROM cand c,
             (VALUES {', '.join(f'({p})' for p in IVF_SWEEP)}) s(nprobe)
        WHERE c.probe_rank <= s.nprobe
    ),
    counts AS (
        SELECT nprobe, count(*) AS n_candidates,
               count(DISTINCT q_id) AS n_queries_hit
        FROM swept GROUP BY nprobe
    ),
    topk AS (
        SELECT nprobe, q_id, vec_id FROM (
            SELECT nprobe, q_id, vec_id,
                   row_number() OVER (
                       PARTITION BY nprobe, q_id
                       ORDER BY cos_raw DESC, vec_id ASC) AS rk
            FROM swept
        ) WHERE rk <= {IVF_TOP_K}
    ),
    truth AS (
        SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_DOT.format(a='q.emb', b='c.emb')}
                                / (q.norm * c.norm) DESC,
                                c.vec_id ASC) AS rk
            FROM en q JOIN en c
              ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ) WHERE rk <= {IVF_TOP_K}
    ),
    hits AS (
        SELECT t.nprobe, count(*) AS n_hits
        FROM topk t JOIN truth u USING (q_id, vec_id)
        GROUP BY t.nprobe
    ),
    nt AS (SELECT count(*) AS n_truth FROM truth)
    SELECT CAST(c.nprobe AS BIGINT) AS nprobe,
           CAST(c.n_queries_hit AS BIGINT) AS n_queries_hit,
           CAST(c.n_candidates AS BIGINT) AS n_candidates,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(nt.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(h.n_hits, 0) * 1000000 // nt.n_truth AS BIGINT)
               AS recall_ppm
    FROM counts c LEFT JOIN hits h ON h.nprobe = c.nprobe, nt
"""
