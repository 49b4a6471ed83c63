#!/usr/bin/env python3
"""Merge subset bench re-runs into a full-suite bench detail JSON.

Used when a full-suite probe had a transient per-query failure (e.g. the
r16 sf10 probe's ENOSPC window): re-run just those queries with
`graft.Bench <names...>`, then overlay the clean readings onto the full
detail file. Queries re-measured are removed from the base file's
`failed` list; totals and the r1 rollup are recomputed from the merged
per-query map so downstream tools (adjudicate_sf10, freeze_scale_baseline)
see one consistent run.

Usage:
  python3 tools/merge_bench_detail.py <base_detail.json> \
      <subset_detail.json> [more_subset.json ...] -o <out.json>
"""
import json, sys


def main():
    argv = sys.argv[1:]
    out = argv[argv.index("-o") + 1]
    files = [a for i, a in enumerate(argv)
             if a != "-o" and (i == 0 or argv[i - 1] != "-o")]
    base = json.load(open(files[0]))
    merged_from = {}
    for path in files[1:]:
        sub = json.load(open(path))
        still_failed = set(sub.get("failed", []))
        for q, v in sub["queries"].items():
            if q in still_failed:
                continue
            merged_from[q] = path
            base["queries"][q] = v
            if q in base.get("failed", []):
                base["failed"].remove(q)
    qs = base["queries"]
    base["value"] = round(sum(qs.values()), 3)
    r1 = set(base.get("r1_query_set", []))
    if r1:
        base["warm_total_r1_queries"] = round(
            sum(v for k, v in qs.items() if k in r1), 3)
    base["merged_overrides"] = {q: p for q, p in sorted(merged_from.items())}
    with open(out, "w") as f:
        json.dump(base, f, indent=1, sort_keys=False)
    print(f"[merge] {len(merged_from)} overridden, "
          f"{len(base.get('failed', []))} still failed -> {out}")


if __name__ == "__main__":
    main()
