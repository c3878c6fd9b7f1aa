"""Plan lint over EVERY registry query: the physical-plan invariants that
keep these shapes viable at 100 TB, asserted automatically so a regression
in any query's plan fails CI, not the cluster bill."""

from __future__ import annotations

import pytest

from ai_service_ocr_grading_handler_spark.plans import registry

SF = "/root/testdata/sf0.001"

# queries whose join is INTENTIONALLY a broadcast nested-loop (small
# broadcast side x non-equi condition) — everything else must be hash/merge
_BNLJ_OK = {"cosine_topk", "ivf_ann_topk"}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_cartesian_product(spark, name):
    """A plain CartesianProduct (both sides unbounded) is never acceptable;
    BroadcastNestedLoopJoin only where the broadcast side is a bounded
    query set."""
    df = registry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} fell back to nested-loop join"
        )


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "doc_token_stats"],
)
def test_filters_reach_the_scan(spark, name):
    df = registry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # at least one real pushed filter (not the empty list)
    assert "PushedFilters: []" not in plan.split("PushedFilters", 1)[1][:200]


def test_extract_scan_prunes_to_kernel_columns(spark):
    """The flagship scan must read only (url, warc_ts, lang, html) +
    synthesis inputs — never the ground-truth text column of documents
    beyond what synthesis needs, and html must not survive the kernel."""
    df = registry.queries()["extract_pages"](spark, SF)
    assert "html" not in df.columns
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_broadcast_joins_where_intended(spark):
    for name in ["q3_shipping_priority", "route_requests", "prompt_lookup"]:
        df = registry.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
