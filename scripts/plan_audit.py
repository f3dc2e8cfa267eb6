#!/usr/bin/env python
"""Auto-generate the per-round physical-plan audit (SCALE_r{N}.md body).

For each audited query: run it at the given SF (default sf0.01) so AQE
finalizes the plan, then count shuffle exchanges, broadcasts, sort-merge
joins, cartesian / broadcast-nested-loop joins, WholeStageCodegen spans,
parquet filter pushdown, row-at-a-time Python UDF stages (must be 0) and
Arrow-batched Python stages.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.session import get_spark

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "cdc_materialize",
    "cdc_chunked_snapshot",
    "cdc_hybrid_pipeline",
    "dedup_minhash_lsh_pairs",
    "text_token_histogram",
    "ann_topk_cosine",
    "dedup_spans",
    "dedup_semantic",
    "cdc_asof_prior_image",
    "layout_zorder_orders",
    # round-5 additions
    "cdc_charset_decode",
    "cdc_mongo_resume_token",
    "text_normalize",
    "ann_topk_ivf_trained",
    "multimodal_probe",
    "dedup_embedding_cosine_lsh",
    "sketch_count_min",
    "dedup_fuzzy_blocked",
    # round-6 additions
    "cdc_mongo_nested_decode",
    "cdc_schema_evolution",
    # round-7 additions (window promotions + the DDL e2e carrying a
    # computed column)
    "pipeline_token_budget",
    "pipeline_sequence_pack",
    "cdc_mongo_changestream_decode",
    "cdc_sql_ddl_pipeline",
    "sketch_hll_distinct",
    "pipeline_priority_sample",
    "sketch_quantile_histogram",
    # round-8 additions (incremental maintenance: delta join + Top-N).
    # Note: their replay harnesses checkpoint state per batch, so the
    # FINAL plan shows only the last lazy stage — the per-batch
    # exchanges run inside the replay jobs.
    "cdc_delta_join",
    "cdc_topn_maintained",
    "pipeline_incremental_dedup",
    # round-9/10 additions (sketch-state maintenance + the SQL bridge).
    # Same caveat as the r8 rows: replay harnesses checkpoint state per
    # batch, so the FINAL plan shows the last lazy stage; the per-batch
    # exchanges run inside the replay jobs.
    "sketch_hll_incremental",
    "sketch_hist_incremental",
    "cdc_sql_ddl_maintained_agg",
    "cdc_sql_ddl_maintained_sum",
    # r10 late additions: session windows, windowing TVF forms, the
    # join-chain cascade, interval-join bounds (same replay caveat)
    "cdc_sql_session_window",
    "cdc_sql_three_way_join",
    "cdc_sql_cumulate_window",
    "cdc_sql_interval_join",
    "cdc_sql_distinct_agg",
    "cdc_sql_temporal_join",
    "cdc_sql_union_agg",
    "cdc_sql_over_agg",
    "cdc_sql_dedup_first",
    "cdc_sql_lookup_join",
    "cdc_sql_over_lag",
    "cdc_sql_window_topn",
    "cdc_sql_except_all",
    "cdc_sql_window_join",
    "cdc_sql_match_recognize",
    # r11: the general-pattern NFA, windowed min/max, windowed distinct
    "cdc_sql_match_recognize_nfa",
    "cdc_sql_hop_minmax",
    "cdc_sql_window_distinct",
    "cdc_sql_union_minmax",
    "cdc_sql_match_prev_rising",
    # r12: cross-variable DEFINEs, MATCH output/skip modes, global
    # grouping set, session DISTINCT (same replay caveat)
    "cdc_sql_match_cross_var",
    "cdc_sql_match_all_rows",
    "cdc_sql_match_skip_to_last",
    "cdc_sql_match_reluctant",
    "cdc_sql_grouping_sets_minmax",
    "cdc_sql_session_distinct",
    "cdc_sql_calc_project",
    "cdc_sql_global_agg",
    # r13: cross-var arithmetic/OR, RUNNING all-rows measures (same
    # replay caveat)
    "cdc_sql_match_cross_var_affine",
    "cdc_sql_match_cross_var_or",
    "cdc_sql_match_all_rows_running",
    "cdc_sql_match_exclusion",
    "cdc_sql_match_alternation",
]


def audit(plan: str) -> dict:
    return {
        "exch": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        # count join NODES directly (BNLJ has its own column) — deriving
        # the count from exchange/join ratios miscounts under AQE's
        # ReusedExchange / BroadcastQueryStage wrapping
        "bcast": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cart": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushdown": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
        "pyUDF": plan.count("BatchEvalPython"),
        "arrow": plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas") + plan.count("FlatMapCoGroupsInPandas"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    print("| query | exch | bcast | smj | cart | bnlj | codegen | pushdown | pyUDF | arrow |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name in names:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        df.count()  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        print(
            f"| {name} | {a['exch']} | {a['bcast']} | {a['smj']} | {a['cart']} | "
            f"{a['bnlj']} | {a['codegen']} | {a['pushdown']} | {a['pyUDF']} | {a['arrow']} |"
        )


if __name__ == "__main__":
    main()
