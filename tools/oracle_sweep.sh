#!/bin/bash
# Standing multi-SF oracle sweep (r10 — the r9 sweep caught the x59
# theta_union lgK defect that the sf0.01-only driver gate could never
# see, so the full sweep is now a per-round gate like Smoke's analysis
# tripwire). Runs graft.Verify + the DuckDB oracle compare at EVERY
# fixture SF and prints one summary line per SF; paste the datum into
# BASELINE.md each round.
#
# Usage: tools/oracle_sweep.sh            # all three SFs
#        tools/oracle_sweep.sh sf0.1      # one SF
# Env:   SPARK_GRAFT_CPUS (default 16), SPARK_GRAFT_VERIFY_ONLY (filter)
set -u
cd "$(dirname "$0")/.."
sfs=${1:-"sf0.001 sf0.01 sf0.1"}
summary=""
rc=0
for sf in $sfs; do
  out="/tmp/graft_sweep_$sf"
  log="/tmp/graft_sweep_$sf.log"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    sbt -batch "runMain graft.Verify /root/testdata/$sf $out" > "$log" 2>&1
  if grep -q "\[verify\]" "$log"; then
    echo "== $sf verify-stage failures:"
    grep "\[verify\]" "$log"
    rc=1
  fi
  olog="/tmp/graft_sweep_${sf}_oracle.log"
  # a Verify-side filter must also filter the compare side, or every
  # un-dumped query reads as a failure
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out" \
    ${SPARK_GRAFT_VERIFY_ONLY:+"$SPARK_GRAFT_VERIFY_ONLY"} > "$olog" 2>&1 \
    || rc=1
  line=$(tail -1 "$olog")
  grep -E "^FAIL" "$olog"
  echo "$sf: $line"
  summary="$summary$sf: $line | "
done
echo
echo "SWEEP SUMMARY: $summary"
exit $rc
