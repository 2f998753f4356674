"""Timestamp physical-type portability pins.

The driver's generator has shipped its timestamp columns (events.ts,
orders.o_orderdate, lineitem.l_shipdate) in three parquet variants
across rounds: TIMESTAMP(NANOS) (Spark reads as long under
``nanosAsLong``), naive TIMESTAMP(MICROS) (infers as TIMESTAMP_NTZ),
and UTC-adjusted TIMESTAMP(MICROS). A regeneration flip hits every
timestamp query at once (it crashed the round-2 bench), so the loader
normalization (``io._normalize_ns_timestamps``) is pinned here against
ALL variants for ALL shipped timestamp columns — not just events.ts.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_zoom_kinesis_spark.io import TABLES, load_table

TS_TABLES = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}

VARIANTS = ("nanos", "micros_naive", "micros_utc")


def _rewrite(src: str, dst: str, col: str, variant: str) -> None:
    t = pq.read_table(src)
    idx = t.schema.get_field_index(col)
    arr = t.column(idx)
    if variant == "nanos":
        typ = pa.timestamp("ns")
    elif variant == "micros_naive":
        typ = pa.timestamp("us")
    else:
        typ = pa.timestamp("us", tz="UTC")
    t = t.set_column(idx, pa.field(col, typ), arr.cast(typ))
    pq.write_table(t, dst)


@pytest.fixture(scope="module")
def variant_dirs(sf_dir, tmp_path_factory):
    dirs = {}
    for variant in VARIANTS:
        d = tmp_path_factory.mktemp(f"tsvar_{variant}")
        for tbl, col in TS_TABLES.items():
            _rewrite(
                os.path.join(sf_dir, f"{tbl}.parquet"),
                str(d / f"{tbl}.parquet"),
                col,
                variant,
            )
        for tbl in TABLES:
            src = os.path.join(sf_dir, f"{tbl}.parquet")
            dst = d / f"{tbl}.parquet"
            if os.path.exists(src) and not dst.exists():
                os.symlink(src, dst)
        dirs[variant] = str(d)
    return dirs


@pytest.mark.parametrize("tbl,col", sorted(TS_TABLES.items()))
def test_all_variants_load_identically(spark, sf_dir, variant_dirs, tbl, col):
    from pyspark.sql import functions as F

    def epochs(d):
        df = load_table(spark, d, tbl)
        assert dict(df.dtypes)[col] == "timestamp", (d, df.dtypes)
        return sorted(
            r[0]
            for r in df.select(F.col(col).cast("long")).limit(500).collect()
        )

    base = epochs(sf_dir)
    for variant, d in variant_dirs.items():
        assert epochs(d) == base, variant


def test_timestamp_query_identical_across_variants(spark, sf_dir, variant_dirs):
    """A real windowed query — not just the scan — agrees bit-for-bit
    across physical variants."""
    from go_zoom_kinesis_spark.operators.streaming_analogs import QUERIES

    fn = QUERIES["windowed_metrics"]

    def result(d):
        return sorted(map(tuple, fn(spark, d).collect()))

    base = result(sf_dir)
    assert base
    for variant, d in variant_dirs.items():
        assert result(d) == base, variant
