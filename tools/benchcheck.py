#!/usr/bin/env python3
"""Bench regression gate: compare a fresh Bench JSON line against the
pinned per-query baseline (tools/bench_baseline.json).

Usage: benchcheck.py <bench.json|-> [max_ratio]

<bench.json> may be the raw one-line Bench output, or a driver
BENCH_r*.json wrapper (the "parsed" key is used). Queries absent from
the baseline are reported as NEW and not gated; a query that regresses
more than max_ratio (default 2.0x, small absolute times are exempt
below 0.5 s) fails the check. Exit 1 on any regression or failed query.
"""
import json
import sys


def load_bench(path):
    raw = json.load(open(path)) if path != "-" else json.load(sys.stdin)
    if "parsed" in raw:
        raw = raw["parsed"]
    return raw


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    bench = load_bench(sys.argv[1])
    max_ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    base = json.load(open(__file__.rsplit("/", 1)[0] + "/bench_baseline.json"))
    bq, nq = base["queries"], bench["queries"]
    bad = []
    for name, t in sorted(nq.items()):
        if t is None or t < 0:
            bad.append(f"FAILED  {name}: bench recorded a failure sentinel")
            continue
        if name not in bq:
            print(f"NEW     {name}: {t:.2f}s (not in baseline, not gated)")
            continue
        b = bq[name]
        ratio = t / b if b > 0 else float("inf")
        tag = "ok"
        if ratio > max_ratio and t > 0.5:
            tag = "REGRESSED"
            bad.append(f"{tag} {name}: {t:.2f}s vs baseline {b:.2f}s ({ratio:.1f}x)")
        elif ratio < 1 / max_ratio and b > 0.5:
            tag = "improved"
        print(f"{tag:9s} {name}: {t:.2f}s vs {b:.2f}s ({ratio:.2f}x)")
    missing = sorted(set(bq) - set(nq))
    for name in missing:
        bad.append(f"MISSING {name}: in baseline but not in this bench run")
    print(f"\n{len(nq)} queries, {len(bad)} problems")
    if bad:
        print("\n".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
