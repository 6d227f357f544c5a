"""Dump .explain('formatted') for the r10 optimization round's evidence
files: plans/r10/<query>_<tag>.txt (tag = before|after).

Usage: python tools/plans_r10.py <before|after> [query ...]
Default query set: the headline bench suite + this round's optimization
targets. sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seoul_big_data_spark.queries import QUERIES  # noqa: E402
from seoul_big_data_spark.session import get_spark  # noqa: E402

DEFAULT = [
    # headline suite
    "flagship_pricing_summary",
    "ingest_resume_load",
    "filter_eq",
    "join_catalog_dims",
    "join_left_outer_agg",
    "window_latest_per_group",
    "window_running_sum",
    "agg_cube",
    "agg_count_distinct",
    "events_sessionization",
    "events_asof_join",
    "text_token_stats",
    "text_term_frequency",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_brute_force_topk",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "dq_profile_columns",
    "merge_upsert_pattern",
    "events_funnel_conversion",
    "corpus_prep_pipeline",
    # extended optimization targets (slowest extended entries at round open)
    "mlprep_logreg_newton_step",
    "graph_pagerank_neardup",
    "dedup_survivor_best_quality",
    "dedup_cluster_size_histogram",
    "pq_codes_md5",
    "pq_adc_md5",
    "text_textrank_keywords",
    "mlprep_quality_classifier",
    "events_peak_concurrency",
    "recsys_item_item_cosine",
    "similarity_ivf_pq_ann",
    "dedup_lsh_recall_eval",
    "stats_rfm_segmentation",
    "events_markov_absorbing_conversion",
    "dedup_simhash_md5",
    "stats_market_basket_pairs",
    "graph_triangle_count",
    "text_bigram_logprob",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans_r10")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
