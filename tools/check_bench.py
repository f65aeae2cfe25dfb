#!/usr/bin/env python3
"""Mechanical bench-receipt check (BENCH_NOTES round-15 discipline).

Usage: python3 tools/check_bench.py [BENCH_OUT.json]

Checks the receipt against the committed repeat-column targets and the
zero-inversion rule (repeat <= cold per query). Exit 0 = fully clean.
One target miss in an otherwise-clean run is the documented ambient
single-query burst — retry the window rather than diagnosing the plan.
"""
import json
import sys

TARGETS = {
    "q01_agg": 0.75,
    "q03_join": 0.65,
    "q07_topk": 0.65,
    "q09_range_join": 1.55,
    "q13_closure": 0.70,
    "q14_components": 1.30,
    "q16_dedup_exact": 0.45,
    "q19_ngram_jaccard": 1.20,
    "q21_ann_top1": 1.00,
    "q25_minhash_lsh": 1.20,
    "q26_simhash": 0.80,
    "q28_idf": 0.90,
    "q30_token_blocking": 1.20,
    "q39_stays": 0.60,
    "q41_agent_match": 1.55,
    "q49_multimodal": 0.35,
    "q82_span_dedup": 1.00,
    "q102_audio": 0.40,
    "q103_video": 0.60,
    "q120_asof_join": 0.80,
    "q121_pagerank": 2.60,
    "q133_setsim_join": 3.20,
    "q158_bm25_topk": 2.00,
    "q159_heavy_hitters": 1.00,
    "q174_dsir": 1.50,
    "q199_knn_join": 2.40,
    "q207_ivf_serve": 1.80,
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_OUT.json"
    d = json.load(open(path))
    cold, rep = d["queries"], d["queries_repeat"]
    problems = []

    missing = sorted(set(TARGETS) - set(rep))
    extra = sorted(set(rep) - set(TARGETS))
    for q in missing:
        problems.append(f"MISSING  {q}: in targets but not in receipt")
    for q in extra:
        problems.append(f"UNGATED  {q}: in receipt but has no target")

    inversions = [q for q in rep if q in cold and rep[q] > cold[q]]
    for q in inversions:
        problems.append(f"INVERT   {q}: repeat {rep[q]:.3f} > cold {cold[q]:.3f}")

    misses = [(q, rep[q], TARGETS[q]) for q in sorted(TARGETS) if q in rep and rep[q] > TARGETS[q]]
    for q, v, t in misses:
        problems.append(f"MISS     {q}: repeat {v:.3f} > target {t}")

    print(f"receipt: {path}  total_repeat={d.get('total_repeat')}  "
          f"steal={d.get('steal_pct')}%  load_start={d.get('load_avg_start')}")
    if d.get("steal_pct", 0) is not None and d.get("steal_pct", 0) > 0.1:
        print(f"WARNING  steal {d['steal_pct']}% > 0.1 — host window, not a receipt")
    for p in problems:
        print(p)
    print(f"== {len(misses)} target miss(es), {len(inversions)} inversion(s), "
          f"{len(missing)} missing, {len(extra)} ungated ==")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
