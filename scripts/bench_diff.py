#!/usr/bin/env python3
"""Round-over-round bench diff with a 2x alarm (round-10 verdict #8: the
round-9 regression confusion existed because no tool compared bench
artifacts — this one prints the per-query diff table and FAILS on
unexplained >2x per-query regressions).

Usage: python3 scripts/bench_diff.py [current.json] [previous.json]
                                     [--allow q1,q2 --floor 0.3]

Defaults: current = bench/bench_latest.json; previous = the
highest-numbered BENCH_r*.json in the repo root. A query only alarms when
its previous median is >= floor seconds (default 0.3 — sub-300ms medians
are scheduler noise at this suite's scale) AND its median regressed >2x.
--allow names queries whose regression is adjudicated (e.g. an intentional
semantics change); they print as ALLOWED instead of failing. New queries,
removed queries, and failures are always listed. Exit 1 on any
non-allowed alarm or any newly-failing query.

Persistent adjudications live in bench/ADJUDICATIONS.json — a list of
{"query", "base_round", "reason"} records. A record applies ONLY when the
comparison base is that round's artifact (bench_r<N>.json / BENCH_r<N>
.json), so an adjudicated one-off (say, a noise-band inflation whose MIN
is byte-identical across rounds) is green as committed for exactly the
artifact pair it was judged on, and the alarm re-arms the moment the base
moves to the next round. This keeps the red tool meaningful: nobody has
to remember a manual --allow, and nothing is exempted forever.
"""
import glob, json, os, re, signal, sys

try:
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (AttributeError, ValueError):
    pass

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    text = open(path).read()
    start = text.find("{")
    if start < 0:
        raise SystemExit(f"no JSON object in {path}")
    doc = json.loads(text[start:])
    # the driver's BENCH_r*.json wraps the bench line as {"parsed": {...}}
    # (and "parsed" is null when its stdout capture truncated the line)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def newest_round_artifact():
    """Newest USABLE previous artifact: prefer the bench/bench_r*.json the
    engine writes (never truncated); fall back to driver BENCH_r*.json
    whose `parsed` survived."""
    rounds = []
    for pat, rx in ((os.path.join(ROOT, "bench/bench_r*.json"),
                     r"/bench_r(\d+)\.json$"),
                    (os.path.join(ROOT, "BENCH_r*.json"),
                     r"BENCH_r(\d+)\.json$")):
        for p in glob.glob(pat):
            m = re.search(rx, p)
            if not m:
                continue
            try:
                if load(p).get("queries"):
                    rounds.append((int(m.group(1)), p))
            except Exception:
                pass
    if not rounds:
        raise SystemExit("no usable previous bench artifact found")
    return max(rounds)[1]


def main():
    args = [a for a in sys.argv[1:]]
    allow = set()
    floor = 0.3
    require_median = False
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--allow":
            allow |= {q.strip() for q in args[i + 1].split(",") if q.strip()}
            i += 2
        elif args[i] == "--floor":
            floor = float(args[i + 1])
            i += 2
        elif args[i] == "--require-median":
            require_median = True
            i += 1
        else:
            pos.append(args[i])
            i += 1
    cur_path = pos[0] if pos else os.path.join(ROOT, "bench/bench_latest.json")
    prev_path = pos[1] if len(pos) > 1 else newest_round_artifact()
    cur, prev = load(cur_path), load(prev_path)
    # fold in on-file adjudications scoped to this comparison's base round
    m = re.search(r"r(\d+)(?:_[a-z0-9]+)?\.json$",
                  os.path.basename(prev_path), re.IGNORECASE)
    base_round = int(m.group(1)) if m else None
    adj_path = os.path.join(ROOT, "bench/ADJUDICATIONS.json")
    if base_round is not None and os.path.exists(adj_path):
        for rec in json.load(open(adj_path)):
            if rec.get("base_round") == base_round:
                allow.add(rec["query"])
                print(f"adjudicated vs r{base_round}: {rec['query']} — "
                      f"{rec.get('reason', '')}")
    # median-to-median by construction (round-11 verdict #5): the gate
    # writes its median-of-3 run to an explicit path and passes
    # --require-median, so a stray repeat-1 artifact (one cold pass vs a
    # median base = guaranteed false alarms) can never be the comparison.
    cr, pr = cur.get("repeat", 1), prev.get("repeat", 1)
    print(f"comparing repeat={cr} current vs repeat={pr} base")
    if require_median and (cr < 3 or pr < 3):
        raise SystemExit(
            f"FAIL: --require-median needs median-of-3 artifacts on both "
            f"sides (current repeat={cr}, base repeat={pr})")
    cq = dict(cur.get("queries", {}))
    pq = dict(prev.get("queries", {}))
    # result-row counts (round-14 verdict #7): a "speedup" whose output
    # shrank is a fixture/semantics change, not a win — surface it
    crows = dict(cur.get("rows", {}))
    prows = dict(prev.get("rows", {}))

    rows, alarms, newly_failed, shrunk_speedups = [], [], [], []
    for name in sorted(set(cq) | set(pq)):
        c, p = cq.get(name), pq.get(name)
        if p is None:
            rows.append((name, None, c, None, "NEW"))
            continue
        if c is None:
            rows.append((name, p, None, None, "REMOVED"))
            continue
        if c < 0 and p >= 0:
            newly_failed.append(name)
            rows.append((name, p, c, None, "FAILED"))
            continue
        if p <= 0:
            rows.append((name, p, c, None, "prev-failed"))
            continue
        ratio = c / p
        status = ""
        if ratio > 2.0 and p >= floor:
            status = "ALLOWED" if name in allow else "ALARM >2x"
            if name not in allow:
                alarms.append(name)
        elif ratio < 0.5 and p >= floor:
            status = "improved"
        cr, pr2 = crows.get(name, -1), prows.get(name, -1)
        if cr >= 0 and pr2 >= 0 and cr != pr2:
            status = (status + " ROWSΔ " +
                      f"{pr2}->{cr}").strip()
            if ratio < 0.5 and p >= floor and cr < pr2 and name not in allow:
                shrunk_speedups.append(name)
        rows.append((name, p, c, ratio, status))

    ct = cur.get("value", 0.0)
    pt = prev.get("value", 0.0)
    print(f"bench diff: {os.path.relpath(cur_path, ROOT)} vs "
          f"{os.path.relpath(prev_path, ROOT)}")
    print(f"total: {pt:.1f}s -> {ct:.1f}s "
          f"({ct / pt:.2f}x)" if pt else f"total: -> {ct:.1f}s")
    print(f"{'query':<32} {'prev':>8} {'cur':>8} {'ratio':>6}  status")
    for name, p, c, r, status in rows:
        if not status and r is not None and 0.67 <= r <= 1.5:
            continue  # stable rows stay out of the table
        ps = f"{p:8.2f}" if p is not None else "       -"
        cs = f"{c:8.2f}" if c is not None else "       -"
        rs = f"{r:6.2f}" if r is not None else "     -"
        print(f"{name:<32} {ps} {cs} {rs}  {status}")

    ok = True
    if newly_failed:
        print(f"FAIL: newly failing queries: {', '.join(newly_failed)}")
        ok = False
    if alarms:
        print("FAIL: unexplained >2x regressions: " + ", ".join(alarms) +
              " (adjudicate and pass --allow, or fix)")
        ok = False
    if pt and ct / pt > 1.5 and not alarms and not newly_failed:
        print(f"WARN: total regressed {ct / pt:.2f}x with no single-query "
              "alarm — distributed slowdown, investigate")
    if shrunk_speedups:
        print("FAIL: >2x 'speedups' whose result shrank (fixture change "
              "masquerading as a win): " + ", ".join(shrunk_speedups) +
              " (adjudicate and pass --allow, or fix)")
        ok = False
    if ok:
        print("bench diff OK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
