"""The persist-strategy knob (r12, ADVICE r11 dedup.py:128).

Every operator pins intermediates through ``persist.pin``; which
storage the pin uses is a session conf, because the local-bench-right
choice (GC-bounded ``localCheckpoint``) is the real-cluster-WRONG one
(unreplicated blocks + truncated lineage = executor loss kills the
job). These tests pin:

- result equality across all three strategies on an operator that
  pins at every tier (minhash bands + candidate dict),
- the default (no conf set) stays ``localCheckpoint`` — the measured
  local shape every bench number was taken under,
- strategy plumbing: ``cache`` leaves an InMemoryRelation in the plan,
  ``checkpoint`` writes RDD files under the configured reliable dir
  and fails LOUDLY when no dir is configured (silently falling back
  to a non-durable store would defeat the knob's purpose),
- unknown strategy names fail loudly.
"""

from __future__ import annotations

import os

import pytest

from go_zoom_kinesis_spark.persist import (
    CHECKPOINT_DIR_CONF,
    STRATEGY_CONF,
    pin,
)

from conftest import SF_DIR


@pytest.fixture
def strategy_conf(spark):
    """Restore the session to the default strategy afterwards."""
    yield spark
    spark.conf.unset(STRATEGY_CONF)
    spark.conf.unset(CHECKPOINT_DIR_CONF)
    spark.catalog.clearCache()


def test_checkpoint_without_dir_fails_loudly(strategy_conf):
    # MUST run before any checkpoint-strategy test in this module: a
    # context-level checkpoint dir, once set, cannot be unset on a
    # shared SparkContext.
    spark = strategy_conf
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        pytest.skip("context already has a checkpoint dir")
    spark.conf.set(STRATEGY_CONF, "checkpoint")
    with pytest.raises(ValueError, match=CHECKPOINT_DIR_CONF):
        spark.range(8).transform(pin)


def _run(spark, strategy, tmp_path):
    from go_zoom_kinesis_spark.operators.dedup import dedup_minhash_lsh

    if strategy is not None:
        spark.conf.set(STRATEGY_CONF, strategy)
    if strategy == "checkpoint":
        spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ck"))
    spark.catalog.clearCache()
    return sorted(map(tuple, dedup_minhash_lsh(spark, SF_DIR).collect()))


def test_strategies_agree(strategy_conf, tmp_path):
    spark = strategy_conf
    default = _run(spark, None, tmp_path)
    assert default, "operator returned no rows"
    for strategy in ("localCheckpoint", "cache", "checkpoint"):
        assert _run(spark, strategy, tmp_path) == default, strategy


def test_default_is_local_checkpoint(spark):
    df = spark.range(8).transform(pin)
    # localCheckpoint shows up as a truncated logical plan over an
    # internal RDD scan — no InMemoryRelation (cache), no files on disk
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert "InMemoryRelation" not in plan


def test_cache_strategy_uses_cachemanager(strategy_conf):
    spark = strategy_conf
    spark.conf.set(STRATEGY_CONF, "cache")
    df = spark.range(8).transform(pin)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    assert df.count() == 8
    df.unpersist()


def test_checkpoint_strategy_writes_reliable_dir(strategy_conf, tmp_path):
    spark = strategy_conf
    spark.conf.set(STRATEGY_CONF, "checkpoint")
    # a context-level dir may already be set by an earlier test (it
    # cannot be unset); pin() only applies the conf when none is set,
    # so assert against the dir the context ACTUALLY uses
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "reliable"))
    df = spark.range(8).transform(pin)
    assert df.count() == 8
    ckdir = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    ckdir = ckdir.removeprefix("file:")
    written = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert written, f"reliable checkpoint wrote no block files in {ckdir}"


def test_unknown_strategy_fails_loudly(strategy_conf):
    spark = strategy_conf
    spark.conf.set(STRATEGY_CONF, "tachyon")
    with pytest.raises(ValueError, match="tachyon"):
        spark.range(8).transform(pin)
