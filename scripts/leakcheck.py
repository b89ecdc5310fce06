#!/usr/bin/env python3
"""Leak sweep: greps the build artifacts (src/, build.sbt, scripts/) for
anything that is not derivable from public knowledge — non-public imports,
URLs outside the public ecosystem, cloud bucket URIs, credential-shaped
strings, workspace chat links, suspicious env-var names — and writes
LEAKCHECK.json. The artifact records the generation time and HEAD sha so
a clean round is provably a fresh sweep, not a number bump (round-9
ADVICE).

Usage: python3 scripts/leakcheck.py [round_number]
"""
import json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Imports rooted at a reverse-domain prefix that is neither the public
# Spark/Scala ecosystem nor this project — lowercase-val imports like
# `import spark.implicits._` are local and never match.
PATTERNS = {
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|io|ai|net|co|dev|corp|internal)\.(?!github\.)"),
    "internal-url": re.compile(
        r"https?://(?!(?:[\w.-]*\.)?(?:apache\.org|github\.com|scala-lang\.org|"
        r"scalatest\.org|duckdb\.org|w3\.org|example\.com|localhost)\b)[\w.-]+"),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    "slack-link": re.compile(r"\b(?:slack\.com/|go/[a-z][\w-]{1,30}\b|#[a-z0-9-]*claude[a-z0-9-]*)"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{30,}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    "suspicious-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_|COURSIER_|JAVA_|PATH\b)[A-Z_]+\""),
}

def files():
    for base in ("src", "scripts"):
        for dirpath, _, names in os.walk(os.path.join(ROOT, base)):
            for n in names:
                if n.endswith((".scala", ".sbt", ".py", ".sh", ".md")):
                    yield os.path.join(dirpath, n)
    yield os.path.join(ROOT, "build.sbt")
    # Root-level prose docs and bench notes are exactly where a stray
    # internal URL would land (round-10 advice) — sweep them too.
    # PAPERS.md / SNIPPETS.md are DRIVER-retrieved public content (full of
    # legitimate public URLs), not build artifacts, so they stay out.
    retrieved = {"PAPERS.md", "SNIPPETS.md"}
    for n in sorted(os.listdir(ROOT)):
        if n.endswith(".md") and n not in retrieved:
            yield os.path.join(ROOT, n)
    bench_dir = os.path.join(ROOT, "bench")
    if os.path.isdir(bench_dir):
        for n in sorted(os.listdir(bench_dir)):
            if n.endswith(".json"):
                yield os.path.join(bench_dir, n)

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = {k: [] for k in PATTERNS}
    for path in files():
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for key, pat in PATTERNS.items():
                if pat.search(line):
                    hits[key].append(f"{rel}:{i}: {line.strip()[:160]}")
    sha = subprocess.run(["git", "-C", ROOT, "rev-parse", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    doc = {
        "round": rnd,
        "generated_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "head_sha": sha,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(ROOT, "LEAKCHECK.json")
    json.dump(doc, open(out, "w"), indent=2)
    print(f"LEAKCHECK.json: {doc['n_hits']} hits at {sha[:12]}")
    return 1 if doc["n_hits"] else 0

if __name__ == "__main__":
    sys.exit(main())
