"""CI gate: every registry query's physical plan meets the scale-safety
floor — no CartesianProduct, no BroadcastNestedLoopJoin beyond the named
tiny-side allowances, no row-at-a-time Python.  Plans are compiled (not
executed) so the whole registry checks in seconds; the deep audit with
executed-plan properties is tools/plan_audit.py → PLANS.md."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from unfurl_spark.operators.queries import QUERIES
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _registry())
def test_plan_scale_safety(spark, name):
    import sys
    sys.path.insert(0, "tools")
    from plan_audit import universal_checks

    from unfurl_spark.operators.queries import QUERIES

    fn, _sql = QUERIES[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for label, pred in universal_checks(name):
        assert pred(plan), f"{name}: {label}\n{plan[:2000]}"
