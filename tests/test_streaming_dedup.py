"""Streaming curation stages: cross-micro-batch exact dedup with
watermark-bounded state, and batch/stream equivalence of the stateless
PII scrub projection."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.streaming.dedup_stream import (
    scrub_documents,
    streaming_exact_dedup,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ingest_ts", TimestampType()),
        StructField("text", StringType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: two distinct docs + an intra-batch duplicate of doc A
    _write_batch(
        spark,
        src,
        [
            (1, t0, "alpha beta gamma"),
            (2, t0, "delta epsilon zeta"),
            (3, t0, "alpha beta gamma"),
        ],
    )
    # batch 2 (separate file => separate micro-batch with
    # maxFilesPerTrigger=1): duplicate of doc A again + one new doc,
    # all within the 1h watermark horizon
    _write_batch(
        spark,
        src,
        [
            (4, t0 + dt.timedelta(minutes=5), "alpha beta gamma"),
            (5, t0 + dt.timedelta(minutes=5), "eta theta iota"),
        ],
    )

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    out = spark.sql("select * from dedup_stream_t").collect()

    texts = sorted(r["text"] for r in out)
    assert texts == [
        "alpha beta gamma",
        "delta epsilon zeta",
        "eta theta iota",
    ]
    # the surviving 'alpha beta gamma' is the FIRST arrival
    alpha = [r for r in out if r["text"] == "alpha beta gamma"]
    assert len(alpha) == 1 and alpha[0]["doc_id"] in (1, 3)
    # duplicate from the later micro-batch was dropped by state
    assert all(r["doc_id"] != 4 for r in out)


def test_scrub_projection_stream_equals_batch(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # inject one deterministic email per doc so the scrub does work
    docs = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    )
    batch_out = sorted(
        (r["doc_id"], r["redacted_text"], r["n_emails"])
        for r in scrub_documents(docs).collect()
    )
    assert all(n >= 1 for _, _, n in batch_out)
    assert all("@" not in t for _, t, _ in batch_out)

    src = str(tmp_path / "scrub_src")
    docs.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        scrub_documents(stream)
        .writeStream.format("memory")
        .queryName("scrub_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_scrub"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    stream_out = sorted(
        (r["doc_id"], r["redacted_text"], r["n_emails"])
        for r in spark.sql("select * from scrub_stream_t").collect()
    )
    assert stream_out == batch_out


def test_streaming_dedup_rocksdb_provider_parity(spark, tmp_path):
    """The dedup stream's watermark-evicted hash state must behave
    identically under the RocksDB state-store provider — the provider
    a production ingest deployment runs so the dedup set spills to
    local SSD instead of living in executor heap. Same staged
    two-micro-batch scenario as the default-provider test; same
    survivors, same cross-batch drop."""
    import datetime as dt

    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    old = spark.conf.get(provider_conf, None)
    spark.conf.set(provider_conf, rocksdb)
    try:
        src = str(tmp_path / "src_rdb")
        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        _write_batch(
            spark,
            src,
            [
                (1, t0, "alpha beta gamma"),
                (2, t0, "delta epsilon zeta"),
                (3, t0, "alpha beta gamma"),
            ],
        )
        _write_batch(
            spark,
            src,
            [
                (4, t0 + dt.timedelta(minutes=5), "alpha beta gamma"),
                (5, t0 + dt.timedelta(minutes=5), "eta theta iota"),
            ],
        )
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_stream_rdb_t")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_rdb"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming query did not finish in 120s"
        out = spark.sql("select * from dedup_stream_rdb_t").collect()
        texts = sorted(r["text"] for r in out)
        assert texts == [
            "alpha beta gamma",
            "delta epsilon zeta",
            "eta theta iota",
        ]
        assert all(r["doc_id"] != 4 for r in out)
    finally:
        if old is None:
            spark.conf.unset(provider_conf)
        else:
            spark.conf.set(provider_conf, old)


# --- streaming MinHash-LSH screen: batch==stream band accounting ----------


def test_streaming_lsh_screen_matches_batch_banding(spark, tmp_path):
    """The stream's per-(doc, band) collision accounting must equal the
    batch referee: same banded signatures (shared Column expressions),
    buckets ordered by (arrival batch, doc_id)."""
    import datetime as dt

    from go_zoom_kinesis_spark.streaming.dedup_stream import (
        minhash_band_stream,
        streaming_lsh_screen,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # last token differs
    other = "one two three four five six seven eight"
    batch1 = [(10, t0, base), (11, t0, other)]
    batch2 = [
        (20, t0, base),   # exact dup of 10 -> all 4 buckets collide
        (21, t0, near),   # near dup -> some buckets collide
        (22, t0, "unrelated tokens entirely different words here now"),
    ]
    src = str(tmp_path / "src")
    _write_batch(spark, src, batch1)
    _write_batch(spark, src, batch2)

    # batch referee: same banding projection, arrival order =
    # (batch, doc_id)
    arrival = {d: 0 for d, _, _ in batch1} | {d: 1 for d, _, _ in batch2}
    bdf = minhash_band_stream(
        spark.createDataFrame(batch1 + batch2, DOC_SCHEMA)
    ).select("doc_id", "band_idx", "band_key")
    buckets = {}
    for r in bdf.collect():
        buckets.setdefault((r["band_idx"], r["band_key"]), []).append(
            r["doc_id"]
        )
    expected = set()
    for (bi, bk), docs in buckets.items():
        docs.sort(key=lambda d: (arrival[d], d))
        for i, d in enumerate(docs):
            expected.add((d, bi, bk, i, docs[0]))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_lsh_screen(stream)
        .writeStream.format("memory")
        .queryName("lsh_screen_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = {
        (r["doc_id"], r["band_idx"], r["band_key"], r["n_prior"], r["first_doc_id"])
        for r in spark.sql("select * from lsh_screen_t").collect()
    }
    assert got == expected
    # the exact duplicate must be flagged in EVERY band; the unrelated
    # doc in none — invariants independent of the referee
    flagged = {}
    for d, bi, bk, n_prior, first in got:
        flagged[d] = flagged.get(d, 0) + (1 if n_prior > 0 else 0)
    assert flagged[20] == 4
    assert flagged[22] == 0


def test_two_tier_screen_covers_batch_verify(spark, tmp_path, sf_dir):
    """Two-tier architecture pin: every document the batch verify tier
    (dedup_incremental_lsh: incoming slice vs standing corpus, exact
    Jaccard) reports MUST have been flagged by the streaming screen
    when the corpus arrives as (existing batch, incoming batch) — the
    screen's band buckets are the same relation the verify join
    probes, so a verify hit without a screen flag is impossible."""
    from go_zoom_kinesis_spark.operators.dedup import (
        INCR_MOD,
        INCR_SLOT,
        dedup_incremental_lsh,
    )
    from go_zoom_kinesis_spark.streaming.dedup_stream import (
        streaming_lsh_screen,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    existing = [
        (r["doc_id"], t0, r["text"])
        for r in docs
        if r["doc_id"] % INCR_MOD != INCR_SLOT
    ]
    incoming = [
        (r["doc_id"], t0, r["text"])
        for r in docs
        if r["doc_id"] % INCR_MOD == INCR_SLOT
    ]
    src = str(tmp_path / "src2")
    _write_batch(spark, src, existing)
    _write_batch(spark, src, incoming)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_lsh_screen(stream)
        .writeStream.format("memory")
        .queryName("two_tier_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    flagged = {
        r["doc_id"]
        for r in spark.sql(
            "select doc_id from two_tier_t where n_prior > 0"
        ).collect()
    }
    verified = {
        r["doc_id"] for r in dedup_incremental_lsh(spark, sf_dir).collect()
    }
    assert verified, "verify tier found nothing - pin is vacuous"
    assert verified <= flagged

def test_two_tier_pipeline_composes_screen_and_verify(spark, sf_dir):
    """The registered composed query (``dedup_two_tier_pipeline``) IS
    the two-tier architecture, end to end: no verified doc escapes the
    screen tier, and the verify tier reproduces the FULL LSH pair
    relation (``dedup_minhash_lsh``) restricted to earlier partners —
    i.e. restricting verification to screen-flagged docs loses
    nothing."""
    from collections import defaultdict

    from go_zoom_kinesis_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_two_tier_pipeline,
    )

    rows = dedup_two_tier_pipeline(spark, sf_dir).collect()
    assert all(r["screen_hit"] for r in rows if r["n_verified"] > 0)
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    n = defaultdict(int)
    canon = {}
    for p in pairs:
        n[p["doc_b"]] += 1
        canon[p["doc_b"]] = min(
            canon.get(p["doc_b"], p["doc_a"]), p["doc_a"]
        )
    assert any(r["n_verified"] for r in rows), "verify tier empty - vacuous"
    for r in rows:
        assert r["n_verified"] == n.get(r["doc_id"], 0)
        assert r["canonical_id"] == canon.get(r["doc_id"], r["doc_id"])
        assert r["is_survivor"] == (r["n_verified"] == 0)


def test_streaming_lsh_screen_bucket_ttl_evicts(spark, tmp_path):
    """r12 (VERDICT r11 #2): with bucket_ttl_ms set, a band bucket
    idle past the TTL is evicted, and the next arrival there is
    UNFLAGGED (n_prior = 0, first_doc_id = itself) — the documented
    probabilistic reversion. Within the TTL the screen still flags.
    ValueState TTL checks expiry on READ, so eviction needs no cleanup
    pass to have run.

    Harness notes (Spark 4.1.2, found building this referee):
    - timeMode=ProcessingTime makes trigger(availableNow) append a
      state-cleanup micro-batch that never finishes ("No new data but
      cleaning up state" spins; observed >4 min idle), so
      awaitTermination hangs — the test runs ONE continuous query and
      polls the memory sink for each batch's commit instead;
    - the memory sink cannot recover a checkpoint, so restart-based
      protocols are out anyway;
    - the TTL clock is processing time BETWEEN micro-batches: the
      in-TTL phase needs enough headroom that batch scheduling (a few
      seconds under load) cannot eat the whole TTL. 20 s >> the ~1-3 s
      observed inter-batch latency; eviction then sleeps past it.

    A concurrent no-TTL control pins that the reversion comes from the
    TTL, not from batch cadence."""
    import datetime as dt
    import time

    from go_zoom_kinesis_spark.streaming.dedup_stream import (
        streaming_lsh_screen,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    ttl_ms = 20_000

    src = str(tmp_path / "src")
    queries = []

    def start(qname, ttl):
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        q = (
            streaming_lsh_screen(stream, bucket_ttl_ms=ttl)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
            .start()
        )
        queries.append(q)
        return q

    def wait_docs(qname, docs, timeout=120):
        deadline = time.time() + timeout
        seen = set()
        while time.time() < deadline:
            seen = {
                r[0]
                for r in spark.sql(
                    f"select distinct doc_id from {qname}"
                ).collect()
            }
            if docs <= seen:
                return
            time.sleep(0.5)
        raise AssertionError(f"{qname}: docs {docs - seen} never committed")

    def flags(qname, doc):
        return {
            (r["n_prior"], r["first_doc_id"])
            for r in spark.sql(
                f"select * from {qname} where doc_id = {doc}"
            ).collect()
        }

    _write_batch(spark, src, [(10, t0, base)])
    try:
        start("ttl_q", ttl_ms)
        start("ctl_q", None)
        wait_docs("ttl_q", {10})
        wait_docs("ctl_q", {10})
        t_seed = time.time()

        # phase 2, INSIDE the TTL: dup must be flagged against doc 10
        _write_batch(spark, src, [(20, t0, base)])
        wait_docs("ttl_q", {20})
        wait_docs("ctl_q", {20})
        in_ttl = flags("ttl_q", 20)
        # guard: the whole phase must have fit inside the TTL, or the
        # flag assertion is vacuous (slow-host protection, not logic)
        assert time.time() - t_seed < ttl_ms / 1000 - 2, (
            "host too slow for the in-TTL phase; raise ttl_ms"
        )
        assert in_ttl == {(1, 10)}, f"inside the TTL must flag: {in_ttl}"

        # phase 3, AFTER the TTL: bucket evicted -> unflagged
        elapsed = time.time() - t_seed
        time.sleep(max(0.0, ttl_ms / 1000 - elapsed) + 3)
        _write_batch(spark, src, [(30, t0, base)])
        wait_docs("ttl_q", {30})
        wait_docs("ctl_q", {30})
        after = flags("ttl_q", 30)
        assert after == {(0, 30)}, (
            f"bucket idle past the TTL must evict -> unflagged: {after}"
        )
        # control without TTL keeps full bucket history across the
        # same cadence
        assert flags("ctl_q", 30) == {(2, 10)}
    finally:
        for q in queries:
            q.stop()
