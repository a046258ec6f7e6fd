#!/bin/bash
# Round-9 whale-scale anatomy probes (VERDICT r8 items 2, 3, 5):
#   - graft.Profile at the sf10 corpus for the three near-gate d-family warm
#     queries (d12 9.69x, d4 9.42x, d11 7.24x per decade) and the two
#     Cumulative-family queries (a16/a22, ~5.7x/decade) — names the dominant
#     term of each before decade 3 does;
#   - graft.GbtBandProbe at sf10 — records the BAND VALUES (mae/ybar, r^2)
#     the m12/lab2 verdict booleans threshold, at the 42M-row corpus under
#     the 2M fit budget.
# Sequential on purpose: sbt holds a project lock, and concurrent suites
# would contend for the same 32 cores anyway. A failed probe is recorded
# (tmp/scale/r9_probes_status.log) and the sequence continues.
set -u
cd "$(dirname "$0")/.."
SF10=tmp/scale/sf10
STATUS=tmp/scale/r9_probes_status.log
: > "$STATUS"
for q in d12_dup_spans d4_simhash d11_minhash_calibration \
         a16_group_deciles a22_weighted_median; do
  echo "== profile $q at $SF10"
  if SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Profile $q $SF10 2" \
      > "tmp/scale/profile_r9_$q.full.log" 2>&1; then
    echo "$q OK" >> "$STATUS"
  else
    echo "$q FAILED (see tmp/scale/profile_r9_$q.full.log)" >> "$STATUS"
  fi
  grep -E '\[profile\]' "tmp/scale/profile_r9_$q.full.log" \
    > "tmp/scale/profile_r9_$q.log" || true
done
echo "== gbt band probe at $SF10"
if SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.GbtBandProbe $SF10" \
    > tmp/scale/gbt_band_sf10.full.log 2>&1; then
  echo "gbt_band OK" >> "$STATUS"
else
  echo "gbt_band FAILED (see tmp/scale/gbt_band_sf10.full.log)" >> "$STATUS"
fi
grep -E '"query"' tmp/scale/gbt_band_sf10.full.log \
  > tmp/scale/gbt_band_sf10.log || true
echo "== r9 probes done"
echo DONE >> "$STATUS"
