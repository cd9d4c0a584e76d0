"""Catalog-wide physical-plan lint: build EVERY declared query's plan
and flag the anti-patterns that break a 100 TB scale-up.

Complements the per-family plan tests (tests/test_tpch.py etc.), which
pin positive properties (broadcast, TakeOrdered, pushdown) on chosen
queries; this tool is the negative sweep over the WHOLE catalog:

- ``CartesianProduct`` — a real unkeyed cross join (quadratic);
- ``BroadcastNestedLoopJoin`` outside the explicit allowlist below —
  each allowed use names the bound (1-row scalar aggregate, literal
  range, bounded query set) that keeps it scale-safe;
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan
  (ArrowEvalPython / mapInPandas / mapInArrow stay allowed).

Queries whose callable runs side effects (streaming fixtures, file
sinks) still only have their RETURNED DataFrame linted — the fixture
cost at sf0.001 is the price of building the plan.

Usage: python tools/plan_lint.py [sf_dir] [name_filter]
Exit 1 on any finding; prints one line per query otherwise.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tabular_to_parquet_spark.session import get_spark

#: BroadcastNestedLoopJoin is quadratic work per broadcast row, so it
#: is legitimate ONLY when the broadcast side is provably bounded.
#: Every use in the catalog must be listed here with the bound that
#: keeps it scale-safe; anything else is flagged.
BNLJ_ALLOWED = {
    # 1-row scalar aggregate broadcast (scalar subquery lowered to a
    # literal join) — asserted BroadcastNestedLoopJoin-over-aggregate
    # in tests/test_tpch.py
    "h11_important_parts": "1-row scalar aggregate (value threshold)",
    "h14_promo_effect": "1-row scalar aggregate (total revenue)",
    "h15_top_supplier": "1-row scalar aggregate (max revenue)",
    "h22_sales_opportunity": "1-row scalar aggregate (avg acctbal)",
    "x13_vocab_coverage": "1-row scalar aggregate (corpus token total)",
    "x17_bm25_topk": "1-row scalar aggregate (N docs + avg doclen)",
    "x18_tfidf_top_terms": "1-row scalar aggregate (N docs)",
    "pl19_temperature_mixture": "1-row scalar aggregate (weight normalizer)",
    "pl21_prepare_training_run": "1-row scalar aggregate (token budget)",
    "pl24_negative_samples": "1-row scalar aggregate (corpus size N)",
    "pl25_curriculum_phases": "1-row scalar aggregate (exact quartiles)",
    "pr14_equi_depth_histogram": "1-row scalar aggregate (exact octile edges)",
    "a37_rfm_scores": "1-row scalar aggregate (exact RFM quartile edges)",
    "x37_collocations": "1-row scalar aggregate (bigram total N)",
    "g02_triangle_count": "1-row scalar aggregate (global count)",
    "x32_association_rules": "1-row scalar aggregate (basket total)",
    "a16_decile_stats_scale": "1-row scalar aggregate (total row count for ntile)",
    "x42_vocab_growth": "1-row scalar aggregate (corpus max doc id)",
    "pr27_hll_estimate_audit": "1-row x 1-row aggregate cross join (estimator inputs)",
    "x43_bpe_merge_learning": "1-row argmax broadcast per learned merge round (bounded by round count)",
    "pl37_gd_linear_regressor": "1-row model-state broadcast per GD round (weights + n, bounded by round count)",
    "pl35_quality_dup_calibration_scale": "1-row scalar aggregate (total row count for ntile)",
    # bounded literal fan-out
    "pl26_epoch_shuffle": "broadcast 3-row literal epoch range",
    # broadcast of the bounded QUERY set is the brute-force kNN
    # baseline by definition (|Q| small; |Q|x|C| dots is the point)
    "s01_knn_bruteforce": "broadcast bounded query set",
    "s07_ann_recall_audit": "broadcast bounded query set (s01 ground-truth side)",
}


def lint_plan(name: str, plan: str) -> list[str]:
    findings = []
    if "CartesianProduct" in plan:
        findings.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        findings.append("BatchEvalPython (row-at-a-time Python UDF)")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        findings.append("BroadcastNestedLoopJoin not in allowlist")
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")

    n_checked = 0
    bad = []
    bnlj_users = []
    for name, fn in entry_mod.queries().items():
        if name_filter and not re.search(name_filter, name):
            continue
        n_checked += 1
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            bad.append((name, [f"plan build error: {exc}"]))
            print(f"ERR  {name}: {exc}")
            continue
        findings = lint_plan(name, plan)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj_users.append(name)
        if findings:
            bad.append((name, findings))
            print(f"FLAG {name}: {', '.join(findings)}")
        else:
            print(f"ok   {name}")
    print(f"\n{n_checked - len(bad)}/{n_checked} plans clean "
          f"(allowlisted BNLJ users: {', '.join(bnlj_users) or 'none'})")
    if n_checked == 0:
        print("FAIL: name filter matched no queries")
        return 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
