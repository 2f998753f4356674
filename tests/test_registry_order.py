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
