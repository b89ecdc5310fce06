#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify parquet
dump, run the matching oracle SQL in DuckDB over the same testdata parquet,
sort columns by name / rows by value, and compare values cell-by-cell.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # raw fixtures are single files; ScaleUpGen output is a directory of
    # part files under the same <table>.parquet name
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    if t == "events":
        # ScaleUpGen fixtures store ts as plain INT64 nanos (the raw
        # fixtures are TIMESTAMP(NANOS)); normalize to a microsecond
        # timestamp exactly like graft.Tables.events (ns→µs truncation)
        # so timestamp-typed oracle SQL (q76's interval join) types on
        # scaled fixtures too.
        ty = con.execute(f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
        if ty == "BIGINT":
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
            continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Verify dumps selected.json = the UNION of query names every run against
# this outdir actually selected (r18 advice: without it, a FULL run whose
# driver silently failed to dump one query was indistinguishable from a
# targeted run that never selected it — the gate exited 0 with a "skipped"
# note instead of failing). A selected query with no parquet dir is now a
# FAIL; only queries outside the selected set skip.
selected = None
if os.path.exists(f"{outdir}/selected.json"):
    selected = set(json.load(open(f"{outdir}/selected.json")))
fails = 0
skipped = 0
for name, sql in sorted(oracle.items()):
    if not os.path.isdir(f"{outdir}/{name}"):
        if selected is not None and name in selected:
            print(f"FAIL {name}: selected for this dump but no parquet "
                  f"directory — the Verify run failed to dump it")
            fails += 1
        else:
            skipped += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1
        continue
    # Dtype mismatch is a FAIL, not a warning: the driver's comparator
    # hashes materialized values, and int64 vs float64 (e.g. a DuckDB
    # SUM(BIGINT) surfacing as HUGEINT -> float64) hash-differs even when
    # Python `==` says 1234 == 1234.0 — exactly the r13 q152 miss. Local
    # green must predict driver green.
    if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
        print(f"FAIL {name}: dtypes {list(map(str,got.dtypes))} != {list(map(str,exp.dtypes))}")
        fails += 1
        continue
    g = got.sort_values(by=list(got.columns), ignore_index=True)
    e = exp.sort_values(by=list(exp.columns), ignore_index=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        fails += 1
        continue
    bad = None
    for c in g.columns:
        for i, (a, b) in enumerate(zip(g[c], e[c])):
            eq = (a == b) or (a is None and b is None)
            try:
                if isinstance(a, float) and isinstance(b, float):
                    eq = (a == b) or (math.isnan(a) and math.isnan(b))
            except Exception:
                pass
            if not eq:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i}: spark={a!r} oracle={b!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
checked = len(oracle) - skipped
note = f" ({skipped} not in this dump, skipped)" if skipped else ""
print(f"\n{checked-fails}/{checked} queries match{note}")
sys.exit(1 if fails else 0)
