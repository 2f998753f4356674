"""Frame-sampling plumbing determinism + skew-rewrite equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.multimodal import (
    FRAME_LEN,
    N_FRAMES,
    RESIZE_DIM,
    multimodal_frame_pipeline,
    resize_frame,
    sample_frames,
)
from go_zoom_kinesis_spark.operators.skew import salted_agg


def test_sample_frames_deterministic_and_bounded():
    payload = bytes(range(256)) * 3
    frames = sample_frames(payload)
    assert frames == sample_frames(payload)
    assert 1 <= len(frames) <= N_FRAMES
    for idx, off, fb in frames:
        assert len(fb) <= FRAME_LEN
        assert payload[off : off + len(fb)] == fb
    assert sample_frames(b"") == []


def test_resize_frame_shape():
    out = resize_frame(bytes(range(100)))
    assert len(out) == RESIZE_DIM
    assert resize_frame(b"") == [0] * RESIZE_DIM
    # box-filter sums partition the byte total exactly
    assert sum(out) == sum(range(100))
    # a constant 64-byte frame fills each of the 16 buckets with 4 bytes
    assert resize_frame(bytes([7] * 64)) == [7 * 4] * RESIZE_DIM


def test_frame_pipeline_matches_local(spark, sf_dir):
    """The distributed mapInPandas output must equal a driver-local
    re-computation over the same payloads (plumbing adds nothing)."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    got = {
        (r.doc_id, r.frame_idx): (r.frame_offset, r.frame_len, r.frame_sha)
        for r in multimodal_frame_pipeline(docs).collect()
    }
    local = {}
    for r in docs.select("doc_id", "text").collect():
        payload = r.text.encode("utf-8")
        if len(payload) % 3 != 2:  # modality assignment: 'video' bucket
            continue
        for idx, off, fb in sample_frames(payload):
            local[(r.doc_id, idx)] = (off, len(fb), hashlib.sha256(fb).hexdigest())
    assert got == local
    assert len(got) > 0


def test_salted_agg_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_agg(ev, "event_type")
    direct = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


def test_salted_agg_two_shuffles(spark, sf_dir):
    """The salted plan must actually stage two exchanges: (key, salt)
    then (key) — otherwise it silently degenerated to the naive plan."""
    ev = load_table(spark, sf_dir, "events")
    plan = salted_agg(ev, "event_type")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2


def test_documents_text_is_pure_ascii_all_sfs():
    """LOUD testdata guard: the multimodal oracles equate DuckDB's
    codepoint-based ascii()/length()/substring() with the Python path's
    UTF-8 BYTE operations — valid only while documents.text is pure
    ASCII. Testdata regenerates between rounds; if a regeneration ships
    non-ASCII text this must fail explicitly here, not as an opaque
    driver hash mismatch."""
    import os

    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        (max_cp,) = con.execute(
            f"""SELECT max(list_max(list_transform(
                    split(text, ''), c -> unicode(c))))
                FROM '{p}'"""
        ).fetchone()
        assert max_cp is not None and max_cp < 128, (
            f"{sf}: documents.text contains non-ASCII (max codepoint "
            f"{max_cp}) — the multimodal byte-level oracles are invalid; "
            "rewrite them byte-based before the driver round"
        )


def test_arrow_hist_matches_engine_side_byte_math(spark, sf_dir):
    """mapInArrow buffer arithmetic must equal the same stats computed
    engine-side (octet_length + in-row ascii fold), including empty
    payloads (prefix-sum subtraction, not reduceat)."""
    from go_zoom_kinesis_spark.operators.multimodal import (
        multimodal_arrow_hist,
        with_payload,
    )
    from go_zoom_kinesis_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    wp = with_payload(docs).select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.octet_length(F.col("payload")).cast("bigint").alias("n_bytes"),
        F.aggregate(
            F.transform(
                F.split(F.col("payload").cast("string"), ""),
                lambda c: F.when(c != "", F.ascii(c)).otherwise(F.lit(0)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("byte_sum"),
    )
    expected = {
        r["modality"]: (r["n"], r["tb"], r["ts"])
        for r in wp.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("tb"),
            F.sum("byte_sum").alias("ts"),
        )
        .collect()
    }
    got = {
        r["modality"]: (r["n_docs"], r["total_bytes"], r["total_byte_sum"])
        for r in multimodal_arrow_hist(spark, sf_dir).collect()
    }
    assert got == expected
    # ASCII corpus: the high-bit counter must be identically zero
    assert all(
        r["total_high"] == 0
        for r in multimodal_arrow_hist(spark, sf_dir).collect()
    )
