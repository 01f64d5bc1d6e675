#!/usr/bin/env bash
# Mechanical pre-ship gate (VERDICT r5 task 3). Run before the end-of-round
# commit; every check is the exact one the driver/judge runs.
#
#   tools/preflight.sh            # full: sbt test + Verify + oracle_check
#   tools/preflight.sh --bench    # also run Bench at sf0.1, but ONLY if the
#                                 # 1-min loadavg is < 1.0 (else refuse: a
#                                 # contaminated artifact is worse than none)
#
# Exit nonzero on ANY failure so it can gate a commit script.
set -u
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.01}
OUT=${OUT:-/tmp/graft_preflight}
fail=0

echo "== preflight: sbt test =="
if ! sbt -batch test 2>&1 | tail -5 | tee /tmp/preflight_test.log; then
  fail=1
fi
grep -q "All tests passed." /tmp/preflight_test.log || {
  echo "PREFLIGHT FAIL: sbt test not green"; fail=1; }

echo "== preflight: Verify + oracle_check ($SF) =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >/tmp/preflight_verify.log 2>&1 \
  || { echo "PREFLIGHT FAIL: graft.Verify crashed"; tail -20 /tmp/preflight_verify.log; fail=1; }
if ! python3 tools/oracle_check.py "$SF" "$OUT" | tee /tmp/preflight_oracle.log \
    | tail -3; then
  fail=1
fi
grep -qE "^== [0-9]+ pass, 0 fail ==$" /tmp/preflight_oracle.log || {
  echo "PREFLIGHT FAIL: oracle_check has failures"; fail=1; }

if [ "${1:-}" = "--bench" ]; then
  # the gate's own sbt runs push the 1-min loadavg over 1.0 — wait (up to
  # 6 min) for the machine to settle before deciding, instead of refusing
  # a bench that would be clean 2 minutes later
  for _ in $(seq 1 12); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    python3 -c "import sys; sys.exit(0 if float('$load') < 1.0 else 1)" && break
    echo "preflight: loadavg $load >= 1.0, settling 30s..."
    sleep 30
  done
  load=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$load') < 1.0 else 1)"; then
    echo "== preflight: Bench at sf0.1 (loadavg $load) =="
    SPARK_GRAFT_SF_DIR=${BENCH_SF:-/root/testdata/sf0.1} \
      SPARK_GRAFT_BENCH_OUT=/tmp/preflight_bench_sidecar.json \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
      | tee /tmp/preflight_bench.json
    # The driver's fixed-size stdout tail has truncated the committed bench
    # line three rounds running; the sidecar (SPARK_GRAFT_BENCH_OUT) is the
    # authoritative mitigation — assert here that sidecar and stdout agree
    # so a future divergence (partial write, stale sidecar) is caught while
    # both records still exist.
    if ! python3 - <<'PY'
import json, sys
def full_line(path):
    # Bench brackets the full per-query line with short totals-only lines
    # (r17, driver tail-window fix) — compare the per-query one
    for line in open(path):
        line = line.strip()
        if line.startswith("{") and '"queries":' in line:
            return json.loads(line)
    raise ValueError(f"no per-query bench line in {path}")
try:
    tail = full_line("/tmp/preflight_bench.json")
    side = full_line("/tmp/preflight_bench_sidecar.json")
except Exception as e:
    print(f"PREFLIGHT FAIL: bench tail/sidecar unreadable: {e}"); sys.exit(1)
if tail != side:
    keys = {k for k in set(tail) | set(side) if tail.get(k) != side.get(k)}
    print(f"PREFLIGHT FAIL: bench stdout and sidecar diverge on {sorted(keys)}")
    sys.exit(1)
print(f"bench tail/sidecar consistent ({len(side.get('queries', {}))} queries)")
PY
    then fail=1; fi
  else
    echo "PREFLIGHT FAIL: refusing to bench, 1-min loadavg $load >= 1.0"
    fail=1
  fi
fi

if [ $fail -eq 0 ]; then echo "PREFLIGHT OK"; else echo "PREFLIGHT FAILED"; fi
exit $fail
