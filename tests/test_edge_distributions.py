"""Adversarial-distribution parity pins (CI twin of tools/fuzz_parity).

The driver regenerates its testdata between rounds; these pins hold
the oracle-parity contract on the distributions that previously broke
it: token-less documents (ANSI DIVIDE_BY_ZERO in quality/repetition
scores), negative JSON ints (oracle regex dropped the sign),
empty-list ``list_sum`` (NULL vs 0), round-half boundaries (in-query
round(,4) splits engines), and zero-variance series (correlation
denominator).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
import fuzz_parity  # noqa: E402
import preflight  # noqa: E402

from go_zoom_kinesis_spark.io import TABLES  # noqa: E402

FIXED_QUERIES = (
    "record_map",
    "text_quality",
    "text_repetition_stats",
    "text_token_stats",
    "pipeline_funnel",
    "ts_profile_correlation",
)


@pytest.fixture(scope="module")
def fuzz_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    rng = random.Random(7)
    fuzz_parity.gen_documents(str(d / "documents.parquet"), rng, n=200)
    fuzz_parity.gen_events(str(d / "events.parquet"), rng, n=2000)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = d / f"{t}.parquet"
        if os.path.exists(src) and not dst.exists():
            os.symlink(src, dst)
    return str(d)


@pytest.fixture(scope="module")
def duck(fuzz_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(fuzz_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_edge_distribution_parity(spark, fuzz_dir, duck, name):
    import __spark_entry__ as entry

    preflight.SF_DIR = fuzz_dir
    res = preflight.check_query(
        name,
        entry.queries()[name],
        entry.oracle_sql().get(name),
        spark,
        duck,
    )
    assert res["verdict"] == "green", res
