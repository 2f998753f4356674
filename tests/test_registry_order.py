"""Registry ordering invariants: the driver records verdicts for the
first entries it iterates, so ordering IS the verification schedule."""

from __future__ import annotations

from go_zoom_kinesis_spark import registry


def test_oracle_order_mirrors_queries():
    q = list(registry.all_queries())
    o = list(registry.all_oracle_sql())
    assert o == [n for n in q if n in set(o)]


def test_unverified_queries_lead():
    """No already-green query may occupy the verdict window while any
    unverified query waits behind it."""
    names = list(registry.all_queries())
    green = registry._verified_names()
    seen_verified = False
    for n in names:
        if n in green:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified {n!r} ordered after a verified query"
            )


def test_priority_names_all_registered():
    q = registry.all_queries()
    missing = [n for n in registry._PRIORITY if n not in q]
    assert not missing


def test_green_queries_age_by_verdict_round():
    """Tier 3 (already-green) queries are ordered least-recently-verified
    first, so stale verdicts rotate back into the driver window."""
    names = list(registry.all_queries())
    rounds = registry._verified_rounds()
    green_seq = [rounds[n] for n in names if n in rounds]
    assert green_seq == sorted(green_seq)


def test_no_hazardous_output_types(spark, sf_dir):
    """The driver canonicalizer crashes on list cells and hash-diverges
    on Decimal cells (Spark Decimal vs DuckDB float64). No registered
    query may emit decimal/array/map/struct columns — cast aggregates to
    double and serialize collections before returning."""
    from pyspark.sql import types as T

    def hazards(dt, path):
        if isinstance(dt, T.DecimalType):
            yield path, "decimal"
        if isinstance(dt, (T.ArrayType, T.MapType)):
            yield path, type(dt).__name__
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                yield from hazards(f.dataType, f"{path}.{f.name}")

    bad = {}
    for name, fn in registry.all_queries().items():
        df = fn(spark, sf_dir)  # plan-only: schema needs no execution
        hits = [
            h for f in df.schema.fields for h in hazards(f.dataType, f.name)
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"hazardous output column types: {bad}"
