#!/usr/bin/env bash
# Per-gate JVM isolation for rung sweeps (r19; VERDICT r18 next-round #3).
#
# Long same-JVM rung sweeps accumulate localCheckpoint blocks across gates:
# storage pins that execution cannot evict, so later big sorts die with
# UNABLE_TO_ACQUIRE_MEMORY even though every gate passes isolated (the r18
# SCALING.md caveat). This wrapper runs ONE FORKED JVM PER GATE, so a sweep
# can neither OOM from cross-gate accumulation nor mask a real per-gate
# regression behind a harness failure.
#
# Usage: tools/rung_sweep.sh <sfdir> <gate> [gate...]
#   SPARK_DRIVER_MEM   heap per gate JVM (default 48g)
#   RUNG_MAIN          main class to run per gate (default graft.tools.TimeSome)
#
# The Test classpath is resolved once via sbt and cached; delete
# target/rung_classpath.txt after a dependency change.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?usage: rung_sweep.sh <sfdir> <gate> [gate...]}"
shift
[ "$#" -ge 1 ] || { echo "no gates given" >&2; exit 2; }

CP_CACHE=target/rung_classpath.txt
if [ ! -s "$CP_CACHE" ]; then
  echo "== resolving Test classpath (cached to $CP_CACHE) ==" >&2
  sbt -batch compile Test/compile 'export Test/fullClasspath' 2>/dev/null |
    grep -v '^\[' | grep '/' | tail -1 > "$CP_CACHE"
  [ -s "$CP_CACHE" ] || { echo "classpath resolution failed" >&2; exit 1; }
fi
CP="$(cat "$CP_CACHE")"

# JDK17 module opens — mirrors build.sbt's jdk17AddOpens
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

rc=0
for gate in "$@"; do
  echo "== rung gate: $gate (fresh JVM) =="
  # stderr (Spark INFO noise AND any OOM/stack trace) goes to a per-gate
  # log, not /dev/null: a failed gate must leave its failure reason behind
  errlog="/tmp/rung_${gate//[^A-Za-z0-9_.-]/_}.err"
  # shellcheck disable=SC2086
  if ! java -Xmx"${SPARK_DRIVER_MEM:-48g}" $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" "${RUNG_MAIN:-graft.tools.TimeSome}" "$SF_DIR" "$gate" \
      2>"$errlog"; then
    echo "RUNG_GATE_FAILED $gate (stderr: $errlog)" >&2
    rc=1
  fi
done
exit $rc
