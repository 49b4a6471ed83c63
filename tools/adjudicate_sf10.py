#!/usr/bin/env python3
"""Adjudicate the FULL-SUITE sf10 (100x-bytes) probe: per-query wall
ratios vs the same-code sf0.1 run, bucketed for review. VERDICT r15
item 1's done-bar is "zero failures + every ratio adjudicated vs its
output driver" - this emits the worklist: everything whose wall ratio
exceeds the bytes ratio (100x), plus the r15 probe's readings for
queries both probes covered (continuity check).

Usage:
  python3 tools/adjudicate_sf10.py <sf10_detail.json> <sf01_detail.json> \
      [out_json]
"""
import json, sys

BYTES_RATIO = 100.0


def main():
    sf10 = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2]))
    q10, q01 = sf10["queries"], sf01["queries"]
    prior = {}
    try:
        for q, v in json.load(open("BENCH_r15_scale_sf10.json"))["queries"].items():
            prior[q] = v[1]
    except FileNotFoundError:
        pass
    rows = {}
    for q in sorted(q10):
        base = q01.get(q, 0.0)
        ratio = round(q10[q] / base, 2) if base > 0 else None
        rows[q] = {"sf0.1": base, "sf10": q10[q], "ratio": ratio}
        if q in prior:
            rows[q]["r15_sf10"] = prior[q]
    over = {q: r for q, r in rows.items()
            if r["ratio"] is not None and r["ratio"] > BYTES_RATIO}
    # ADVICE r16: compute the ratio list once; if the two detail files
    # share no queries (wrong pairing) emit None instead of an IndexError.
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"] is not None)
    if not ratios:
        print("[adjudicate] WARNING: no query appears in both detail files "
              "with a nonzero sf0.1 base — check the file pairing",
              file=sys.stderr)
    summary = {
        "n_queries": len(rows),
        "failed": sf10.get("failed", []),
        "warm_total_sf0_1": round(sum(q01.get(q, 0.0) for q in q10), 3),
        "warm_total_sf10": round(sum(q10.values()), 3),
        "suite_ratio": round(sum(q10.values()) /
                             max(sum(q01.get(q, 0.0) for q in q10), 1e-9), 2),
        "median_query_ratio": ratios[len(ratios) // 2] if ratios else None,
        "n_over_bytes_ratio": len(over),
        "over_bytes_ratio": dict(sorted(
            over.items(), key=lambda kv: -kv[1]["ratio"])),
    }
    print(json.dumps(summary, indent=1))
    if len(sys.argv) > 3:
        blob = dict(summary)
        blob["queries"] = rows
        with open(sys.argv[3], "w") as f:
            json.dump(blob, f, indent=1)
        print(f"[adjudicate] wrote {sys.argv[3]}")


if __name__ == "__main__":
    main()
