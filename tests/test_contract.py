"""Driver-contract guards: the bench headline and the __spark_entry__
surface must stay consistent with the registry — a renamed query that
silently drops out of the bench or the driver's queries() map is a
coverage regression the t2 mirror can't see."""

from __future__ import annotations

import sys


def test_bench_headline_names_registered():
    sys.path.insert(0, "/root/repo")
    import bench
    from glonassdatamining_spark import registry

    available = registry.all_queries()
    missing = [n for n in bench.HEADLINE if n not in available]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"


def test_spark_entry_surface():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from glonassdatamining_spark import registry

    qs, osql = E.queries(), E.oracle_sql()
    assert set(qs) == set(registry.all_queries())
    assert set(osql) == set(registry.all_oracles())
    # every oracle key must have a matching query entry
    assert set(osql) <= set(qs)
    # oracle SQL strings must be non-empty
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_all_queries_have_section_ids():
    from glonassdatamining_spark import registry

    registry.all_queries()
    for name in registry.all_queries():
        d = registry.get(name)
        assert d.section, f"{name}: empty section id"


def test_f9_tablesample_properties(spark):
    """TABLESAMPLE REPEATABLE: (a) same seed → identical sample within
    a session (same scan layout), (b) sample ⊆ source keys, (c) the
    10% fraction holds within loose Chernoff bounds."""
    from glonassdatamining_spark import registry
    from glonassdatamining_spark.sources import load
    from tests.conftest import SF_DIR

    q = registry.get("f9_tablesample").builder
    a = sorted(r.o_orderkey for r in q(spark, SF_DIR).collect())
    b = sorted(r.o_orderkey for r in q(spark, SF_DIR).collect())
    assert a == b, "REPEATABLE seed must be deterministic in-session"
    src = {r.o_orderkey for r in load(spark, SF_DIR, "orders").select("o_orderkey").collect()}
    assert set(a) <= src
    frac = len(a) / len(src)
    assert 0.05 < frac < 0.16, f"10% sample came out at {frac:.3f}"


def test_a22_observation_does_not_poison_session(spark):
    """Regression (round-6): a same-session Observation listener broke
    LATER multithreaded ML actions (j9 CrossValidator.fit → 'Task not
    serializable'). a22 must isolate its observed pass in a cloned
    session, so running a22 then j9 on the shared session stays
    green."""
    from glonassdatamining_spark import registry
    from tests.conftest import SF_DIR

    assert (
        len(registry.get("a22_observe_metrics").builder(spark, SF_DIR).collect())
        == 1
    )
    assert (
        len(registry.get("j9_cross_validation").builder(spark, SF_DIR).collect())
        >= 1
    )
