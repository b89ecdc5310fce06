#!/usr/bin/env python3
"""Mixed-corpus gate for the `no_oracle` ML queries (round-13 verdict
"what's missing" #2): the DuckDB oracle cannot express the seeded ML fits,
and the GoldenSpec pins run under the test session config — so the mixed
run's ML outputs can't be checked against either. But the mixed fixture
BYTE-COPIES every non-document table (lineitem, orders, embeddings — all
ML inputs), so under the same Verify session config the mixed dump must be
CELL-IDENTICAL to the base-corpus dump. This closes the one gate axis the
mixed run skipped: a hash/seed/partitioning regression that only
manifests on the mixed path can no longer hide behind rows-only.

Usage: python3 scripts/check_mixed_ml.py <baseVerifyOut> <mixedVerifyOut>
"""
import sys

import duckdb

ML_QUERIES = [
    "q29_ml_rf_confusion", "q30_ml_glr_poisson", "q31_ml_logistic_metrics",
    "q32_ml_als_recs", "q33_ml_kmeans_embed", "q34_ml_cv_best_params",
    "q35_ml_cluster_tokens", "q37_random_split_counts",
    "q153_ml_gbt_cv_best_params",
    # the no_oracle APPROXIMATE-ANN row whose only input (embeddings) is
    # byte-copied into the mixed fixture: the seeded KMeans routing — and
    # therefore the pruned-probe output — must be cell-identical. (q169 /
    # q175 do NOT qualify: their sparse channel reads `documents`, which
    # the mixed fixture extends with planted docs, legitimately shifting
    # BM25 ranks and the fusion.)
    "q164_ivf_prod_probe", "q173_semdedup_prod_probe",
    # q178: the quantized production-probe dedup — same embeddings-only
    # input as q173, certified through the same decision-cert machinery.
    "q178_semdedup_quant_prod",
]

base, mixed = sys.argv[1], sys.argv[2]
con = duckdb.connect()
fails = 0
for q in ML_QUERIES:
    try:
        b = con.execute(
            f"SELECT * FROM read_parquet('{base}/{q}/*.parquet')").fetchdf()
        m = con.execute(
            f"SELECT * FROM read_parquet('{mixed}/{q}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {q}: {type(e).__name__}: {e}")
        fails += 1
        continue
    b = b.reindex(sorted(b.columns), axis=1)
    m = m.reindex(sorted(m.columns), axis=1)
    if list(b.columns) != list(m.columns) or \
            [str(t) for t in b.dtypes] != [str(t) for t in m.dtypes]:
        print(f"FAIL {q}: schema {list(b.columns)}/{list(b.dtypes)} != "
              f"{list(m.columns)}/{list(m.dtypes)}")
        fails += 1
        continue
    bs = b.sort_values(by=list(b.columns), ignore_index=True)
    ms = m.sort_values(by=list(m.columns), ignore_index=True)
    if not bs.equals(ms):
        print(f"FAIL {q}: mixed ML output diverged from base "
              f"({len(bs)} vs {len(ms)} rows)")
        fails += 1
    else:
        print(f"OK   {q} ({len(bs)} rows, mixed == base)")
print(f"\n{len(ML_QUERIES)-fails}/{len(ML_QUERIES)} ML queries identical")
sys.exit(1 if fails else 0)
