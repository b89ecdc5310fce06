#!/usr/bin/env python3
"""Round-over-round drift triage (round-12 verdict #4): compare two or
three bench artifacts query-by-query and bucket the movement.

Usage: drift_compare.py A.json B.json [C.json]
Prints per-query ratios B/A (and C/A) with buckets, plus the
suite-level summary — the evidence for "code moved" vs "environment
moved" adjudications.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    if "parsed" in d:  # round artifacts wrap the bench line
        d = d["parsed"]
    return {k: v for k, v in d.get("queries", {}).items() if v > 0}


def main():
    paths = sys.argv[1:]
    arts = [load(p) for p in paths]
    base = arts[0]
    common = set(base)
    for a in arts[1:]:
        common &= set(a)
    rows = []
    for q in sorted(common):
        ratios = [a[q] / base[q] for a in arts[1:]]
        rows.append((q, base[q], [a[q] for a in arts[1:]], ratios))
    for q, b, vals, ratios in rows:
        tag = ""
        r = ratios[-1]
        if r >= 1.5:
            tag = " <<< regressed"
        elif r <= 0.67:
            tag = " <<< improved"
        vtxt = " ".join(f"{v:7.2f}" for v in vals)
        rtxt = " ".join(f"{x:5.2f}x" for x in ratios)
        print(f"{q:32s} {b:7.2f} {vtxt}  {rtxt}{tag}")
    tot = [sum(base[q] for q in common)] + [
        sum(a[q] for q in common) for a in arts[1:]]
    print(f"\ncommon queries: {len(common)}")
    print("totals: " + "  ".join(
        f"{p.split('/')[-1]}={t:.1f}s" for p, t in zip(paths, tot)))
    import statistics
    for i, a in enumerate(arts[1:], 1):
        med = statistics.median(a[q] / base[q] for q in common)
        print(f"median per-query ratio {paths[i].split('/')[-1]}"
              f"/{paths[0].split('/')[-1]}: {med:.3f}")


if __name__ == "__main__":
    main()
