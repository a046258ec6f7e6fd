#!/bin/bash
# Two-scale whale protocol (BASELINE.md "Whale re-run at round-7 HEAD"):
#
#   1. build the deterministic 10x-fact corpus (tools/make_sf1.py -> tmp/scale/sf1)
#   2. cold full-suite pass at sf1 (reps=1) — the scale screen
#   3. compute each query's sf1/sf0.1 ratio against the committed canonical
#      bench_detail.json and list every query >10x
#   4. warm re-probe exactly those (reps=3, fresh JVM) — splits cold-rep /
#      staged-build amortization artifacts from real super-linearity
#
# A query whose WARM ratio stays >10x is a real scale bug (round 7: the
# a16 low-cardinality ntile window — 12.7x warm, fixed same round).
# Interpret cold-only inflation via the staged-build and codegen causes
# recorded in BASELINE.md; witness panels are embedded in each JSON line.
#
# The cold run REWRITES nothing (floors/bench_detail only rewrite at the
# canonical sf0.1 unfiltered point). Output lands in tmp/scale/.
set -eu
cd "$(dirname "$0")/.."
SF1=tmp/scale/sf1
[ -d "$SF1" ] || python3 tools/make_sf1.py
echo "== cold full suite at $SF1 (reps=1)"
SPARK_GRAFT_SF_DIR="$PWD/$SF1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=1 \
  sbt -batch "runMain graft.Bench" 2>&1 | tee tmp/scale/whale_cold.log |
  grep -E '"metric"' | tail -1 > tmp/scale/whale_cold.json
# The compact line only embeds headline queries for unfiltered runs; the
# full cold detail lands in bench_detail_noncanonical.json (non-sf0.1
# unfiltered runs never touch the canonical bench_detail.json).
OVER=$(python3 - <<'PY'
import json
q=json.load(open('bench_detail_noncanonical.json'))['queries']
base=json.load(open('bench_detail.json'))['queries']
over=[k for k in q if k in base and base[k]>0 and q[k]/base[k]>10]
print('|'.join(sorted(over)))
PY
)
echo "== queries >10x cold: ${OVER:-none}"
if [ -n "$OVER" ]; then
  echo "== warm re-probe (reps=3)"
  SPARK_GRAFT_SF_DIR="$PWD/$SF1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
    SPARK_GRAFT_BENCH_FILTER="^(${OVER})\$" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"' | tail -1 |
    tee tmp/scale/whale_warm.json
  # Filtered runs >30 results fall back to the headline subset on the
  # compact line; the full warm map always lands in the filtered detail
  # file — copy it next to the cold log so step 4's data survives.
  [ -f bench_detail_filtered.json ] &&
    cp bench_detail_filtered.json tmp/scale/whale_warm_detail.json
fi
