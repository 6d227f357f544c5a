"""Physical-plan audit: prints the formatted plan of selected queries and
greps for the scale-critical properties (pushed filters, pruned read schema,
broadcast joins, whole-stage codegen coverage). Run after operator changes —
a correct-but-wrong-shaped plan is a 100 TB bug that sf0.01 hides.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seoul_big_data_spark.queries import QUERIES  # noqa: E402
from seoul_big_data_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

CHECKS = {
    "flagship_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
    "filter_eq": ["PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"],
    "join_catalog_dims": ["BroadcastHashJoin"],
    "tpch_q5_local_supplier_volume": ["BroadcastHashJoin"],
    "window_latest_per_group": ["Window"],
    "project_rename_drop": ["ReadSchema"],
    # new TPC-H shapes: dims must broadcast; date filters must reach parquet
    "tpch_q7_nation_volume": ["BroadcastHashJoin"],
    "tpch_q8_market_share": ["BroadcastHashJoin"],
    "tpch_q9_product_profit": ["BroadcastHashJoin"],
    "tpch_q13_custdist": ["HashAggregate"],
    "tpch_q14_promo_revenue": [
        "BroadcastHashJoin",
        "PushedFilters: [IsNotNull(l_shipdate)",
    ],
    "tpch_q17_small_qty_revenue": ["BroadcastHashJoin", "Window"],
    "tpch_q20_part_promotion": [
        "PushedFilters: [IsNotNull(l_shipdate)",
        "LeftSemi",
    ],
    "tpch_q21_waiting_supplier": ["BroadcastHashJoin", "LeftSemi"],
    # DQ layer: rule filters must push down; profiling is one aggregate
    "dq_accepted_values": ["PushedFilters:"],
    "sample_fraction_md5": ["Filter"],
    "dq_profile_columns": ["HashAggregate"],
    "events_funnel_conversion": ["HashAggregate"],
    # ML-prep + ANN: small sides must broadcast (benchmark set, probe set)
    "text_contamination_overlap": ["BroadcastHashJoin"],
    "similarity_ivf_ann": ["BroadcastHashJoin"],
    "dedup_semantic_ivf": ["BroadcastHashJoin"],
    "text_repetition_metrics": ["ReadSchema"],
}


def main() -> None:
    names = sys.argv[1:] or list(CHECKS)
    spark = get_spark("plan_audit")
    failures = []
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"\n===== {name} =====")
        print(plan[:4000])
        for needle in CHECKS.get(name, []):
            if needle not in plan:
                failures.append((name, needle))
                print(f"!! MISSING: {needle}")
        # Under AQE the un-executed plan carries no codegen annotations;
        # when present (non-AQE or executed final plans) report them.
        ids = set(re.findall(r"codegen id : (\d+)", plan))
        if ids:
            print(f"[codegen spans: {len(ids)}]")
    if failures:
        print("\nAUDIT FAILURES:", failures)
        sys.exit(1)
    print("\nAUDIT OK")
    spark.stop()


if __name__ == "__main__":
    main()
