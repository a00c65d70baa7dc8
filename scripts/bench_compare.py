"""Matched-set subtotals for round-over-round bench comparison
(BASELINE.md "Tiered bench protocol"): given two bench JSON artifacts,
print the shared-query subtotal for each plus the shared-41 baseline
subtotal and the worst per-query ratios.

Usage: python scripts/bench_compare.py NEW.json [OLD.json]
"""

from __future__ import annotations

import json
import sys

SHARED_41 = [
    "e01_enrich_ror", "e02_publication_key", "e03_deal_halving",
    "e04_union_combined", "e05_coverage_zerofill", "e06_prune_semi",
    "e07_priority_rank", "e08_melt_explode", "e09_journal_id",
    "q01_facts_page", "q02_cut_point", "q03_cut_range", "q04_cut_set",
    "q05_cut_negate", "q06_aggregate_summary", "q07_drilldown",
    "q08_multi_drilldown", "q09_order_topk", "q10_pagination_cells",
    "q11_envelope_rollup", "q12_point_lookup", "q13_fact_by_id",
    "q14_members", "q15_total_percentage",
    "x01_dedup_summary", "x02_ngram_jaccard", "x03_minhash_neardup",
    "x04_simhash_neardup", "x05_ann_topk", "x06_lsh_neardup_embeddings",
    "x07_text_metrics", "x08_langid_distribution", "x09_tumbling_daily",
    "x10_sliding_windows", "x11_session_stats", "x12_props_json",
    "x13_salted_drilldown", "x14_ngram_jaccard_capped",
    "x15_media_metadata", "x16_quality_deciles", "x17_ivf_ann",
]


def main() -> None:
    new = json.load(open(sys.argv[1]))["queries"]
    s41 = sum(new[q] for q in SHARED_41 if new.get(q, -1) > 0)
    n41 = sum(1 for q in SHARED_41 if new.get(q, -1) > 0)
    print(f"shared-41 subtotal: {s41:.2f} s over {n41} queries "
          f"(committed round-1 baseline: 20.3 s)")
    if len(sys.argv) > 2:
        old = json.load(open(sys.argv[2]))["queries"]
        shared = sorted(q for q in new if q in old
                        and new[q] > 0 and old[q] > 0)
        sn = sum(new[q] for q in shared)
        so = sum(old[q] for q in shared)
        print(f"shared-{len(shared)} subtotal: new {sn:.2f} s vs old "
              f"{so:.2f} s ({sn / so:.2f}x)")
        ratios = sorted(((new[q] / old[q], q) for q in shared
                         if old[q] >= 0.2), reverse=True)
        print("worst per-query ratios (old >= 0.2 s):")
        for r, q in ratios[:8]:
            print(f"  {r:5.2f}x {q}: {old[q]:.2f} -> {new[q]:.2f} s")


if __name__ == "__main__":
    main()
