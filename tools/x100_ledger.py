#!/usr/bin/env python
"""Assemble the x100 spill-tier ledger from measured side-files.

Round-6 verdict item 2: the committed x100 ledger must be trustworthy
ON ITS OWN — growth ratios computed from the metrics files of the two
runs, never narrated from memory. This tool reads:

- ``bench_metrics_x100.json``  (the x100 subset run — 8 GiB heap,
  SPARK_GRAFT_BENCH_RUNS=1, cache cleared per query by bench.py's
  constrained-tier hygiene), and
- ``bench_metrics_x10_subset.json`` (the SAME 31 queries at x10 under
  the SAME regime — 8 GiB heap, 1 run, cache cleared per query — so the
  ratio isolates the 10x data-size effect; a warm best-of-2 32 GiB
  denominator would inflate every ratio with regime differences the
  numerator pays and the denominator doesn't),

and writes ``BENCH_x100_subset.json`` with per-query ``growth_vs_x10``
= x100 wall / x10 wall (10× input, so ≤10 is at-or-below linear even
with the constrained-memory penalty included), total spill bytes, and
the regime header. Exits 1 if any growth ratio exceeds ``--max-growth``
so the round artifact can't ship a silent super-linear query.

Usage:
    SPARK_GRAFT_SF_DIR=testdata_x100/sf10 SPARK_GRAFT_DRIVER_MEM=8g \\
      SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_SWEEP=0 \\
      SPARK_GRAFT_BENCH_ONLY=$(python tools/x100_ledger.py --print-subset) \\
      SPARK_GRAFT_BENCH_METRICS=bench_metrics_x100.json python bench.py
    python tools/x100_ledger.py
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The spill subset: the most expensive scale-path plans (r6 selection,
# stable across rounds so ledgers compare like-for-like; r8 widened it
# by the families the spill regime had never executed — iterative graph
# peeling/PageRank, the linkage SNB/ER paths, the retractable-MV IVM
# sibling, the new containment prefix plan, global-rownum shuffle,
# sessionization, and BM25 — per round-7 verdict item 5).
SUBSET = [
    "referral_tree_rollup", "basket_part_pairs", "basket_rules_confidence",
    "bfs_hops_parts", "sole_late_supplier", "hbos_outlier_orders",
    "spearman_price_quantity", "ngram_jaccard_pairs", "ngram_jaccard_prefix",
    "ngram_jaccard_prefix_hi", "clean_corpus_docs", "minhash_lsh_pairs",
    "simhash_pairs", "dedup_cc_components", "dedup_cluster_sizes",
    "knn_join_embeddings", "dedup_apply_docs", "edit_distance_pairs",
    "dedup_best_quality_docs", "semantic_dedup_kmeans",
    "ngram_containment_pairs", "source_contamination_matrix",
    "ndcg_int8_ranking", "embedding_near_dup_cells",
    "dbscan_cells_embeddings", "bigram_surprisal_docs",
    "curation_pipeline_docs", "retractable_minmax_sales",
    "triangle_counts_parts", "clustering_coeff_parts",
    "link_prediction_parts",
    # --- r8 additions ---
    "kcore_parts_graph", "pagerank_dedup_graph", "linkage_snb_pairs",
    "entity_resolution_snb", "jaro_winkler_customer_names",
    "ngram_containment_prefix_hi", "retractable_daily_sales",
    "epoch_shuffle_docs", "events_sessionization", "bm25_topk_docs",
    # --- r8 part 2: the exact-substring dedup family (window-hash
    # rank + island merge + rewrite are new shuffle/sort shapes the
    # spill regime has never executed) and the winnow pair join ---
    "maximal_dup_spans_docs", "exact_substring_dedup_docs",
    "winnow_shared_pairs",
    # --- r9 additions (r8 verdict item 2: every plan rewritten in the
    # optimization rounds needs spill-tier evidence): the hamming
    # signature carry (media side), the KMV pins, the r9 rank-stat
    # gate/scaffold consumers, and the winsorized distinct-grain rank ---
    "media_ahash_pairs", "kmv_source_shingle_overlap",
    "ranking_auc_int8", "theil_sen_revenue_trend",
    "winsorized_order_stats", "ks_price_drift",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x100-metrics", default="bench_metrics_x100.json")
    ap.add_argument("--x10-metrics", default="bench_metrics_x10_subset.json")
    ap.add_argument("--out", default="BENCH_x100_subset.json")
    ap.add_argument("--max-growth", type=float, default=10.0)
    ap.add_argument(
        "--print-subset", action="store_true",
        help="print the comma-joined subset (for SPARK_GRAFT_BENCH_ONLY)",
    )
    args = ap.parse_args()
    if args.print_subset:
        print(",".join(SUBSET))
        return 0

    with open(os.path.join(HERE, args.x100_metrics)) as f:
        m100 = json.load(f)
    with open(os.path.join(HERE, args.x10_metrics)) as f:
        m10 = json.load(f)

    q100, q10 = m100["queries"], m10["queries"]
    missing = [q for q in SUBSET if q not in q100]
    if missing:
        raise SystemExit(f"x100 metrics missing subset queries: {missing}")
    # the x10 denominator is just as load-bearing: a query absent from
    # the x10 metrics would silently drop out of growth_vs_x10 and
    # evade the --max-growth gate, so its absence is a hard error too
    missing10 = [q for q in SUBSET if q not in q10]
    if missing10:
        raise SystemExit(f"x10 metrics missing subset queries: {missing10}")
    growth = {q: round(q100[q] / q10[q], 2) for q in SUBSET}
    spill = sum(
        m.get("disk_spill_bytes", 0) for m in m100["query_metrics"].values()
    )
    with_spill = sum(
        1
        for m in m100["query_metrics"].values()
        if m.get("disk_spill_bytes", 0) > 0
    )
    ratios = sorted(growth.values())
    median = ratios[len(ratios) // 2] if ratios else None
    over = {q: g for q, g in growth.items() if g > args.max_growth}

    ledger = {
        "metric": "engine_query_suite_wall_clock",
        "value": round(sum(q100[q] for q in SUBSET), 4),
        "unit": "sec",
        "sf": m100["sf"],
        "n_queries": len(SUBSET),
        "over_budget": len(m100.get("over_budget", {})),
        "exhibits_excluded": len(m100.get("exhibits_excluded", [])),
        "tier": (
            "x100 (tools/make_x10.py --k 100, 2.1 GB parquet, 60M lineitem "
            "/ 500k docs / 200k vectors)"
        ),
        "memory_regime": (
            "SPARK_GRAFT_DRIVER_MEM=8g (deliberately constrained so "
            "external sort/spill paths run); cache cleared before every "
            "query (bench.py constrained-tier hygiene), so ratios measure "
            "the plan, not suite cache history"
        ),
        "runs_per_query": 1,
        "disk_spill_bytes_total": spill,
        "queries_with_spill": with_spill,
        "growth_vs_x10_median": median,
        "growth_vs_x10": dict(sorted(growth.items(), key=lambda kv: -kv[1])),
        "growth_over_max": over,
        "queries": {q: q100[q] for q in SUBSET},
        "provenance": {
            "x100_metrics": args.x100_metrics,
            "x10_metrics": args.x10_metrics,
            "note": (
                "growth_vs_x10 = x100 wall / x10 wall at 10x the input, both "
                "sides measured under the identical constrained regime "
                "(8 GiB, 1 run, cache cleared per query); "
                "computed by tools/x100_ledger.py from the two committed "
                "metrics files — nothing hand-entered"
            ),
        },
    }
    with open(os.path.join(HERE, args.out), "w") as f:
        json.dump(ledger, f, indent=1)
    print(
        f"# {args.out}: total={ledger['value']}s median_growth={median} "
        f"spill={spill >> 30}GiB over_max={sorted(over)}"
    )
    return 1 if over else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
