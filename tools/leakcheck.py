#!/usr/bin/env python3
"""Leak scan over the repo's source tree, with run metadata.

Scans src/, tools/, build.sbt, and the top-level *.md docs for the seven
leak categories the round artifact tracks, and writes LEAKCHECK.json
carrying not just hit lists but proof the scan actually ran: an ISO
timestamp, the number of files scanned, and a sha256 of the rule set —
so a "0 hits" bump between rounds is distinguishable from a skipped scan.

Usage: python3 tools/leakcheck.py [--round N]
"""
import argparse, datetime, hashlib, json, os, re, sys

# Generic leak-shape patterns: each catches a CLASS of non-public artifact
# (corp-internal hostnames, cloud buckets, chat permalinks, credential
# prefixes, private env namespaces) without itself naming anything private.
RULES = {
    "internal-import": r"^\s*import\s+(?:com|net|io)\.[a-z0-9_.]*\b(?:internal|corp|private)\b",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\.[a-z]{2,}",
    "internal-pkg2": r"\b(?:com|net|io)\.[a-z0-9]+\.(?:internal|secret|corp)\.[a-z0-9_.]+",
    "internal-bucket": r"\b(?:s3|gs|abfss?|s3a|s3n)://[a-z0-9][a-z0-9.-]+",
    "slack-link": r"https?://[a-z0-9-]+\.slack\.com/\S+",
    "api-key": r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36}|xox[baprs]-[A-Za-z0-9-]{10,})\b",
    "axon-env": r"\b[A-Z][A-Z0-9_]*(?:_SECRET|_TOKEN|_APIKEY|_API_KEY|_CREDENTIALS?)\b\s*=",
}

SCAN_EXT = {".scala", ".py", ".sbt", ".md", ".json", ".sql", ".sh", ".conf"}
SKIP_DIRS = {"target", ".git", ".bsp", ".metals", ".bloop", "tmp",
             "spark-warehouse", "metastore_db"}
# Allowlist: env-var patterns this repo legitimately documents/reads.
ALLOW = re.compile(r"SPARK_GRAFT_|COURSIER_|example|EXAMPLE|placeholder")


def scan(root):
    hits = {k: [] for k in RULES}
    compiled = {k: re.compile(v) for k, v in RULES.items()}
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if rel.startswith("LEAKCHECK"):
                continue
            n_files += 1
            try:
                with open(path, errors="replace") as f:
                    for lineno, line in enumerate(f, 1):
                        for cat, rx in compiled.items():
                            m = rx.search(line)
                            if m and not ALLOW.search(line):
                                hits[cat].append(f"{rel}:{lineno}: {m.group(0)[:120]}")
            except OSError:
                pass
    return hits, n_files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--root", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args = ap.parse_args()

    rnd = args.round
    out_path = os.path.join(args.root, "LEAKCHECK.json")
    if rnd is None and os.path.exists(out_path):
        try:
            rnd = json.load(open(out_path)).get("round")
        except Exception:
            rnd = None

    hits, n_files = scan(args.root)
    ruleset_hash = hashlib.sha256(
        json.dumps(RULES, sort_keys=True).encode()).hexdigest()
    doc = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "files_scanned": n_files,
        "ruleset_sha256": ruleset_hash,
        "tool": "tools/leakcheck.py",
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"LEAKCHECK: {doc['n_hits']} hits over {n_files} files "
          f"(ruleset {ruleset_hash[:12]})")
    return 0 if doc["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
