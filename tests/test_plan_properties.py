"""Plan-quality regression tests: the properties that make these
queries scale (predicate pushdown, column pruning, broadcast-only
joins, TakeOrderedAndProject top-k) must survive refactors. A failure
here means a plan silently degraded to a full scan or a sort-merge
shuffle — invisible at sf0.01, catastrophic at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from lintdb_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # filter reached the scan
    # column pruning: untouched wide columns absent from ReadSchema
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "partial" in p.lower() or "HashAggregate" in p  # map-side combine


def test_term_date_range_pushdown(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_term_date")
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p


def test_top_orders_broadcast_only(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_top_orders")
    assert "SortMergeJoin" not in p  # dims must broadcast
    assert p.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in p  # top-k, not full sort


def test_topk_cascade_no_sortmerge(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_topk")
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_revenue_by_nation_broadcast_only(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_revenue_by_nation")
    assert "SortMergeJoin" not in p


@pytest.mark.parametrize("name", ["q_maxsim", "q_plaid", "q_assign"])
def test_vector_ops_no_python_udf(spark, sf_dir, name):
    """The oracle-checked vector math must stay JVM-side (no
    BatchEvalPython / ArrowEvalPython nodes = no Python in the plan)."""
    p = plan_of(spark, sf_dir, name)
    assert "EvalPython" not in p
