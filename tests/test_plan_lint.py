"""Fast plan-lint guard: a representative catalog slice through
tools/plan_lint.lint_plan, so anti-pattern regressions (cartesian
products, row-at-a-time Python, un-allowlisted nested-loop broadcasts)
fail the suite without waiting for the full 204-plan sweep.

The full sweep (`python tools/plan_lint.py`) stays the certification
run; this test pins (a) the hot bench queries, (b) every
BroadcastNestedLoopJoin allowlist member that doesn't need a fixture
build, so the allowlist can't drift from reality silently.
"""

from __future__ import annotations

import pytest

from tools.plan_lint import BNLJ_ALLOWED, lint_plan

SF_DIR = "/root/testdata/sf0.001"

# hot-path queries + every non-fixture BNLJ-allowlist member
REPRESENTATIVE = [
    "d01_exact_groups",
    "d04_minhash_pairs",
    "s01_knn_bruteforce",
    "s03_knn_ivf",
    "x21_termfreq_udtf",  # must plan ArrowEvalPythonUDTF, not BatchEval
    "h03_shipping_priority",
    "h11_important_parts",
    "h22_sales_opportunity",
    "x13_vocab_coverage",
    "x17_bm25_topk",
    "pl19_temperature_mixture",
    "pl24_negative_samples",
    "pl25_curriculum_phases",
    "pl26_epoch_shuffle",
    "g02_triangle_count",
    "x32_association_rules",
    "a16_decile_stats_scale",
    "d14_sorted_neighborhood_scale",
]


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_plan_is_clean(spark, catalog, name):
    assert name in catalog, f"{name} renamed/removed — update REPRESENTATIVE"
    df = catalog[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert lint_plan(name, plan) == [], plan[:2000]


def test_bnlj_allowlist_members_exist(catalog):
    """Every allowlist entry must name a live catalog query —
    a renamed/removed query would leave a stale allowlist hole."""
    missing = [n for n in BNLJ_ALLOWED if n not in catalog]
    assert missing == [], missing
