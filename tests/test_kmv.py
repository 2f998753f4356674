"""KMV distinct-sketch referees: pure-Python replay of the sketch,
the estimator, and the merged-sketch overlap — plus oracle parity via
the shared gate (tests/test_oracle_parity.py covers the registered
names automatically; these referees pin the ALGORITHM independently
of both engines).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.stats import (
    KMV_HEX,
    KMV_K,
    KMV_SPACE,
    kmv_distinct_sketch,
    kmv_sketch_overlap,
)


def _py_kmv_hash(key: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:KMV_HEX], 16)


def _py_sketches(rows):
    """event_type → sorted distinct hash list (full, not truncated)."""
    hs = defaultdict(set)
    for r in rows:
        hs[r["event_type"]].add(_py_kmv_hash(r["user_id"]))
    return {t: sorted(v) for t, v in hs.items()}


def test_kmv_distinct_sketch_referee(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .collect()
    )
    full = _py_sketches(rows)
    got = {
        r["event_type"]: r
        for r in kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert sorted(got) == sorted(full)
    for t, hs in full.items():
        r = got[t]
        k_used = min(KMV_K, len(hs))
        assert r["k_used"] == k_used
        assert r["kth_min_hash"] == hs[k_used - 1]
        assert r["exact_distinct"] == len(hs)
        if k_used < KMV_K:
            assert r["est_distinct"] == len(hs)
        else:
            assert r["est_distinct"] == (KMV_K - 1) * KMV_SPACE // hs[
                KMV_K - 1
            ]
        exp_err = (
            abs(r["est_distinct"] - len(hs)) * 1_000_000 // len(hs)
        )
        assert r["err_ppm"] == exp_err
    # the sketch must actually be estimating, not memorizing: at least
    # one type should exceed K distinct users at every shipped sf
    assert any(len(hs) > KMV_K for hs in full.values())


def test_kmv_estimate_within_theory_bounds(spark, sf_dir):
    """KMV standard error is ~1/sqrt(K-2); allow 5 sigma — a
    deterministic dataset either passes forever or the estimator is
    wrong."""
    bound_ppm = int(5 * 1_000_000 / (KMV_K - 2) ** 0.5)
    for r in kmv_distinct_sketch(spark, sf_dir).collect():
        if r["k_used"] == KMV_K:
            assert r["err_ppm"] < bound_ppm
        else:
            assert r["err_ppm"] == 0


def test_kmv_sketch_overlap_referee(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .collect()
    )
    full = _py_sketches(rows)
    sk = {t: set(v[:KMV_K]) for t, v in full.items()}
    got = {
        (r["type_a"], r["type_b"]): r
        for r in kmv_sketch_overlap(spark, sf_dir).collect()
    }
    types = sorted(full)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        merged = sorted(sk[a] | sk[b])[:KMV_K]
        n_both = sum(1 for h in merged if h in sk[a] and h in sk[b])
        assert r["k_merged"] == len(merged)
        assert r["n_both"] == n_both
        assert r["jaccard_est_ppm"] == n_both * 1_000_000 // len(merged)
        inter = len(set(full[a]) & set(full[b]))
        union = len(set(full[a]) | set(full[b]))
        assert r["n_inter_true"] == inter
        assert r["jaccard_true_ppm"] == inter * 1_000_000 // union


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path, sf_dir):
    """Batch==stream pin for the mergeable-sketch architecture: the
    stream tier (streaming_kmv_sketch — one K-row ListState per type,
    merged per micro-batch) must land on EXACTLY the batch operator's
    sketch columns when the corpus arrives as two micro-batches. The
    final state per type is identified order-free: k_used is monotone
    non-decreasing and, at k_used == K, kth_min_hash is monotone
    non-increasing, so (max k_used, min kth) is the last emission."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from go_zoom_kinesis_spark.streaming.kmv_stream import (
        streaming_kmv_sketch,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .collect()
    )
    half = len(rows) // 2
    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("user_id", LongType()),
        ]
    )
    src = str(tmp_path / "kmv_src")
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(
            [(r["event_type"], r["user_id"]) for r in chunk], schema
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_kmv_sketch(stream)
        .writeStream.format("memory")
        .queryName("kmv_stream_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "kmv_ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    emitted = spark.sql("select * from kmv_stream_t").collect()
    assert emitted, "stream emitted nothing - pin is vacuous"
    final = {}
    for r in emitted:
        t = r["event_type"]
        cur = final.get(t)
        if cur is None or (r["k_used"], -r["kth_min_hash"]) > (
            cur["k_used"],
            -cur["kth_min_hash"],
        ):
            final[t] = r
    batch = {
        r["event_type"]: r
        for r in kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert sorted(final) == sorted(batch)
    for t, b in batch.items():
        s = final[t]
        assert s["k_used"] == b["k_used"]
        assert s["kth_min_hash"] == b["kth_min_hash"]
        assert s["est_distinct"] == b["est_distinct"]


def test_kmv_merge_rollup_exact_and_consistent(spark, sf_dir):
    """The merge-rollup contract: (a) merged == direct EXACTLY for
    every type (KMV merge is set-exact, unlike HLL), and (b) the
    direct side is bit-identical to the standalone
    kmv_distinct_sketch (same k_used, kth hash, estimate)."""
    from go_zoom_kinesis_spark.operators.stats import kmv_merge_rollup

    roll = {r["event_type"]: r for r in kmv_merge_rollup(spark, sf_dir).collect()}
    assert roll, "no event types - vacuous"
    sk = {
        r["event_type"]: r
        for r in kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert sorted(roll) == sorted(sk)
    for t, r in roll.items():
        assert r["merged_equals_direct"] is True
        assert r["kth_min_merged"] == r["kth_min_direct"]
        assert r["est_merged"] == r["est_direct"]
        assert r["k_used"] == sk[t]["k_used"]
        assert r["kth_min_direct"] == sk[t]["kth_min_hash"]
        assert r["est_direct"] == sk[t]["est_distinct"]
