"""Property-based tests (hypothesis) + cross-engine hash portability.

The reference's own unit tiers (SURVEY.md §5: backoff math bounds,
retry timing) carried over as properties; plus the portability
invariant this engine's dedup/LSH correctness rests on: the Spark
column expressions, the DuckDB SQL fragments, and a plain-Python
reference implementation of the polynomial hash must agree exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.functions import hashes as H
from go_zoom_kinesis_spark.streaming.backoff import ExponentialBackoff, FixedBackoff


# --- backoff properties (src/retry/backoff.rs:153-232 analog) -----------


@given(
    initial=st.floats(0.001, 10.0),
    maximum=st.floats(0.001, 100.0),
    attempt=st.integers(0, 60),
    jitter=st.floats(0.0, 0.5),
)
@settings(max_examples=200, deadline=None)
def test_backoff_bounded(initial, maximum, attempt, jitter):
    b = ExponentialBackoff(initial, maximum, jitter_factor=jitter)
    d = b.delay(attempt)
    cap = max(initial, maximum)
    assert 0.0 <= d <= cap * (1 + jitter) + 1e-9


@given(attempt=st.integers(0, 40))
@settings(max_examples=50, deadline=None)
def test_backoff_monotone_without_jitter(attempt):
    b = ExponentialBackoff(0.1, 30.0, jitter_factor=0.0)
    assert b.delay(attempt) <= b.delay(attempt + 1) + 1e-12


@given(delay=st.floats(0.0, 10.0), attempt=st.integers(0, 100))
@settings(max_examples=50, deadline=None)
def test_fixed_backoff_constant(delay, attempt):
    assert FixedBackoff(delay).delay(attempt) == delay


# --- portable hash: python reference ------------------------------------


def char_hash_py(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % H.P
    return acc


@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
@settings(max_examples=100, deadline=None)
def test_affine_families_stay_in_range(s):
    h = char_hash_py(s)
    for i in range(H.NUM_HASHES):
        v = (h * H.A[i] + H.B[i]) % H.P
        assert 0 <= v < H.P
        # products stay below 2^63 (the int64-safety claim in hashes.py)
        assert h * H.A[i] + H.B[i] < 2**63


def test_char_hash_three_engines_agree(spark):
    """Spark column expr == DuckDB SQL fragment == python fold, on a
    corpus of tricky strings."""
    corpus = [
        "",
        "a",
        "hello world",
        "the quick brown fox " * 5,
        "punctuation: !@#$%^&*()",
        "numbers 0123456789",
        "  leading and trailing  ",
        "mixed CASE Words",
    ]
    sdf = spark.createDataFrame([(s,) for s in corpus], ["s"])
    spark_vals = [
        r[0] for r in sdf.select(H.char_hash_col(F.col("s"))).collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.execute(
            f"SELECT {H.CHAR_HASH_SQL.format(s='?')}", [s]
        ).fetchone()[0]
        for s in corpus
    ]
    py_vals = [char_hash_py(s) for s in corpus]
    assert spark_vals == py_vals
    assert duck_vals == py_vals


def test_minhash_affine_three_engines_agree(spark):
    hs = [0, 1, 12345, H.P - 1, 987654321]
    sdf = spark.createDataFrame([(h,) for h in hs], ["h"])
    for i in (0, 7, 15):
        spark_vals = [
            r[0] for r in sdf.select(H.affine_col(F.col("h"), i)).collect()
        ]
        duck_vals = [
            duckdb.sql(
                f"SELECT {H.affine_sql(f'CAST({h} AS BIGINT)', i)}"
            ).fetchone()[0]
            for h in hs
        ]
        py_vals = [(h * H.A[i] + H.B[i]) % H.P for h in hs]
        assert spark_vals == py_vals, f"family {i}"
        assert duck_vals == py_vals, f"family {i}"


# --- round-3 multimodal primitives vs pure-python references ------------


@given(payload=st.binary(min_size=0, max_size=512))
@settings(max_examples=200, deadline=None)
def test_fake_decode_matches_scalar_reference(payload):
    from go_zoom_kinesis_spark.operators.multimodal import (
        FEATURE_DIM,
        fake_decode_features,
    )

    got = fake_decode_features(payload)
    ref = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        ref[i % FEATURE_DIM] += b
    assert got == ref
    assert sum(got) == sum(payload)


@given(frame=st.binary(min_size=0, max_size=256))
@settings(max_examples=200, deadline=None)
def test_resize_frame_conserves_byte_total(frame):
    from go_zoom_kinesis_spark.operators.multimodal import RESIZE_DIM, resize_frame

    out = resize_frame(frame)
    assert len(out) == RESIZE_DIM
    assert sum(out) == sum(frame)
    # bucket index is monotone in position => box filter, not a shuffle
    if frame:
        assert all(v >= 0 for v in out)


@given(payload=st.binary(min_size=1, max_size=2048))
@settings(max_examples=200, deadline=None)
def test_sample_frames_cover_and_stay_in_bounds(payload):
    from go_zoom_kinesis_spark.operators.multimodal import (
        FRAME_LEN,
        N_FRAMES,
        sample_frames,
    )

    frames = sample_frames(payload)
    assert 1 <= len(frames) <= N_FRAMES
    for idx, off, fb in frames:
        assert 0 <= off <= max(len(payload) - FRAME_LEN, 0)
        assert payload[off : off + len(fb)] == fb
    # first frame starts at 0; offsets are non-decreasing
    assert frames[0][1] == 0
    offs = [off for _, off, _ in frames]
    assert offs == sorted(offs)


# --- fixed-point money arithmetic (functions/fixedpoint.py) -------------


def test_fixedpoint_testdata_guard():
    """LOUD guard: the fixed-point sum conversion is exact only while
    money columns carry ≤2dp values and l_quantity is integral. If a
    testdata regeneration breaks this, fail HERE, not as an opaque
    driver hash mismatch."""
    import os

    checks = {
        "lineitem": [
            ("l_quantity", 0),
            ("l_extendedprice", 2),
            ("l_discount", 2),
            ("l_tax", 2),
        ],
        "orders": [("o_totalprice", 2)],
        "customer": [("c_acctbal", 2)],
        "supplier": [("s_acctbal", 2)],
        "part": [("p_retailprice", 2)],
        "events": [("value", 6)],
    }
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for table, cols in checks.items():
            p = f"/root/testdata/{sf}/{table}.parquet"
            if not os.path.exists(p):
                continue
            for col, dp in cols:
                (frac,) = con.execute(
                    f"SELECT max(abs({col} - round({col}, {dp}))) FROM '{p}'"
                ).fetchone()
                assert frac == 0.0, (
                    f"{sf}/{table}.{col} has values beyond {dp}dp "
                    f"(max dev {frac}) — fixed-point sums (fsum/isum) "
                    "are no longer exact; re-audit fixedpoint.py call "
                    "sites before the driver round"
                )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-999999, max_value=999999, places=6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_fsum_scalar_reference_exact(vals):
    """fsum's split (floor + scaled fraction) recombination equals the
    exact decimal sum for ≤6dp values, evaluated scalar-side with the
    same arithmetic the engines use."""
    import math

    doubles = [float(v) for v in vals]
    high = sum(math.floor(x) for x in doubles)
    low = sum(round((x - math.floor(x)) * 1000000.0) for x in doubles)
    got = high + low / 1000000.0
    want = float(sum(vals))
    assert abs(got - want) < 5e-7, (vals, got, want)


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=50, deadline=None)
def test_zorder_interleave_is_bijective(pairs):
    """The Morton interleave used by zorder_cluster_audit must be a
    bijection on 8-bit pairs — deinterleaving the code recovers both
    coordinates, so range-bucketing the code can never merge distinct
    (x, y) cells."""

    def z(x, y):
        out = 0
        for i in range(8):
            out += ((x >> i) & 1) << (2 * i)
            out += ((y >> i) & 1) << (2 * i + 1)
        return out

    def unz(code):
        x = sum(((code >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((code >> (2 * i + 1)) & 1) << i for i in range(8))
        return x, y

    for x, y in pairs:
        assert unz(z(x, y)) == (x, y)
        assert 0 <= z(x, y) < 1 << 16


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=80, deadline=None)
def test_phash_zero_pad_invariant(payload):
    """phash_bytes pads the tail block with zero bytes internally, so
    explicitly appending that same zero padding must not change the
    signature (the property that makes the SQL oracle's short final
    block equivalent to numpy's padded reshape)."""
    from go_zoom_kinesis_spark.operators.multimodal import (
        PHASH_BLOCKS,
        phash_bytes,
    )

    h = phash_bytes(payload)
    assert 0 <= h < 1 << PHASH_BLOCKS
    n = len(payload)
    if n:
        blk = -(-n // PHASH_BLOCKS)
        padded = payload + b"\x00" * (blk * PHASH_BLOCKS - n)
        assert phash_bytes(padded) == h


def test_rrf_scores_bounded_and_monotone():
    """Reciprocal-rank fusion invariants: a doc in both lists at rank 1
    gets the maximum 2/(k+1); scores strictly decrease with rank."""
    from go_zoom_kinesis_spark.operators.search import RRF_K

    def rrf(tr, vr):
        return (1.0 / (RRF_K + tr) if tr else 0.0) + (
            1.0 / (RRF_K + vr) if vr else 0.0
        )

    assert rrf(1, 1) == 2.0 / (RRF_K + 1)
    assert rrf(1, None) > rrf(2, None) > rrf(20, None) > 0.0
    assert rrf(1, 1) > rrf(1, None)
