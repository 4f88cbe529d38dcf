#!/bin/bash
# Round-18 adjudication of the one BENCH_r17 driver-run outlier:
# dd_embed_lsh_10x 3.01 -> 6.73 s (2.24x) in the driver tail while the
# builder's own 3-iteration final table shows the row IMPROVING
# (2.47/1.92 vs r16's 2.85/2.36). Two probes:
#  (1) interleaved fresh-JVM focused sessions of the r16-final binary
#      (git worktree at adc6cae, compiled) vs the current head, 3
#      iterations per query per session, q01 + micro_full_table_scan
#      as ambient-drift controls, dd_embed_lsh_10x last;
#  (2) the POSITION experiment that cracked ss_ann_lsh_det: the row
#      run ALONE in a fresh JVM (= first position, full JIT/codegen
#      warm-up replay on its shoulders) vs after the two controls — if
#      the driver's 6.73 s is the mid-pass warm-up replay, the alone
#      session should reproduce its magnitude on BOTH binaries.
# Usage: bash scripts/adjudicate_r18.sh <r16_classes_dir> <out_dir> [mode]
#   mode: focused | position | all (default all)
set -e
OLDCP="${1:-/tmp/graft-r16/target/scala-2.13/classes}"
NEWCP=/root/repo/target/scala-2.13/classes
OUT="${2:-/tmp/adj_r18}"
MODE="${3:-all}"
mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
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
QUERIES=q01_pricing_summary,micro_full_table_scan,dd_embed_lsh_10x

run_bench() { # cp out_tag extra_env...
  local cp="$1" tag="$2"; shift 2
  env "$@" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_DETAIL="$OUT/${tag}.json" \
    java $OPENS -Xmx8g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$cp:$JARS" graft.Bench \
      > "$OUT/${tag}.out" 2> "$OUT/${tag}.err" \
    || echo "SESSION ${tag} FAILED (exit $?)"
}

if [ "$MODE" = focused ] || [ "$MODE" = all ]; then
  for round in 1 2 3; do
    for ver in r16 r18; do
      if [ "$ver" = r16 ]; then CP="$OLDCP"; else CP="$NEWCP"; fi
      echo "=== focused session $ver #$round ==="
      run_bench "$CP" "${ver}_s${round}" \
        SPARK_GRAFT_ITERATIONS=3 SPARK_GRAFT_BENCH_ONLY="$QUERIES"
    done
  done
fi

if [ "$MODE" = position ] || [ "$MODE" = all ]; then
  for round in 1 2; do
    for ver in r16 r18; do
      if [ "$ver" = r16 ]; then CP="$OLDCP"; else CP="$NEWCP"; fi
      echo "=== alone (first-position) $ver #$round ==="
      run_bench "$CP" "alone_${ver}_s${round}" \
        SPARK_GRAFT_ITERATIONS=3 SPARK_GRAFT_BENCH_ONLY=dd_embed_lsh_10x
    done
  done
fi
echo DONE
