#!/bin/bash
# Cross-driver auto-compaction receipt: two WRITER JVMs append small-file
# batches to ONE shared graft-orc path table, each with
# spark.graft.compact_after set and -Dgraft.commit.lock=file, so their
# maintenance windows overlap constantly. Pass 1 runs with the
# compact.intent marker active (default cooldown): the claim is
# per-driver auto_lost_race EXPECTED 0, not guaranteed 0 — the marker's
# check-then-stamp window is not atomic (overwrite-create), so two
# drivers can occasionally both pass intentFresh, both stamp, and one
# loses at expectPresent exactly as without the marker. The marker is
# advisory: it prices the waste OUT in expectation; correctness never
# depends on it. Typically a driver that would have raced a rival's
# merge skips instead (auto_skipped_cross_driver > 0 when windows
# actually overlapped). Pass 2 disables the marker
# (-Dgraft.compact.intent_cooldown_ms=0) as the contrast: the same
# workload may now burn full merges that lose at expectPresent
# (lost_race > 0 — the waste the marker prices out). Both passes must
# end row-exact (the check role throws otherwise).
# Usage: bash scripts/xdriver_receipt.sh [commits] [out_dir]
set -e
COMMITS="${1:-12}"
OUT="${2:-/tmp/xdriver_receipt}"
rm -rf "$OUT"; mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
CP="/root/repo/target/scala-2.13/classes:$JARS"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run_pass() { # pass_name extra_jvm_flags...
  local name="$1"; shift
  local wd="$OUT/$name"
  mkdir -p "$wd"
  java $OPENS -Xmx4g "$@" -cp "$CP" graft.ScaleStress \
    /root/testdata/sf0.1 xdriver "$wd" prep | tee "$OUT/${name}_prep.out"
  java $OPENS -Xmx4g -Dgraft.commit.lock=file "$@" -cp "$CP" \
    graft.ScaleStress /root/testdata/sf0.1 xdriver "$wd" 0 "$COMMITS" \
    > "$OUT/${name}_d0.out" 2> "$OUT/${name}_d0.err" &
  local p0=$!
  java $OPENS -Xmx4g -Dgraft.commit.lock=file "$@" -cp "$CP" \
    graft.ScaleStress /root/testdata/sf0.1 xdriver "$wd" 1 "$COMMITS" \
    > "$OUT/${name}_d1.out" 2> "$OUT/${name}_d1.err" &
  local p1=$!
  # reap BOTH writers before judging anything: with set -e a bare
  # `wait $p0` on a failed writer would abort here, orphaning writer 1
  # mid-mutation and skipping the row-exactness check entirely
  local st0=0 st1=0
  wait $p0 || st0=$?
  wait $p1 || st1=$?
  if [ "$st0" -ne 0 ] || [ "$st1" -ne 0 ]; then
    echo "WRITER FAILED (d0=$st0 d1=$st1) — see $OUT/${name}_d*.err"
    exit 1
  fi
  java $OPENS -Xmx4g "$@" -cp "$CP" graft.ScaleStress \
    /root/testdata/sf0.1 xdriver "$wd" check "$COMMITS" \
    | tee "$OUT/${name}_check.out"
  grep -h '"op":"xdriver"' "$OUT/${name}_d0.out" "$OUT/${name}_d1.out"
}

echo "=== pass 1: intent marker ACTIVE ==="
run_pass marker
echo "=== pass 2: intent marker DISABLED (cooldown=0) ==="
run_pass nomarker -Dgraft.compact.intent_cooldown_ms=0
echo DONE
