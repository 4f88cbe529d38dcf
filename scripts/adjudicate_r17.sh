#!/bin/bash
# Round-17 adjudication of the two BENCH_r16 driver-run outliers
# (ss_ann_lsh_det 9.42x — third recurrence in this row family — and
# q40_exact_aggs 2.36x vs the r15 driver run, on unchanged query code,
# under 1.53x uniform ambient drift):
#  (1) interleaved fresh-JVM focused sessions of the r16-final binary
#      (git worktree at e503a97, compiled) vs the r17 head, 3 iterations
#      per query per session, q01 + micro_full_table_scan as
#      ambient-drift controls;
#  (2) the in-JVM state falsification the verdict asked for: full
#      98-row single-iteration cold passes on the R16 binary (the code
#      the anomaly was observed on) with ss_ann_lsh_det pinned FIRST vs
#      driver order vs pinned LAST via SPARK_GRAFT_BENCH_ONLY — if the
#      12.8 s value is a codegen-cache/GC state effect of the full-pass
#      harness, position should move it; plus the same passes on the r17
#      head, where the suspect HOF quantization kernel is replaced by
#      the native QuantizePrefix expression.
# Usage: bash scripts/adjudicate_r17.sh <r16_classes_dir> <out_dir> [mode]
#   mode: focused | ordering | all (default all)
set -e
R16CP="${1:-/tmp/graft-r16/target/scala-2.13/classes}"
R17CP=/root/repo/target/scala-2.13/classes
OUT="${2:-/tmp/adj_r17}"
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
QUERIES=q01_pricing_summary,micro_full_table_scan,ss_ann_lsh_det,q40_exact_aggs

run_bench() { # ver cp out_tag extra_env...
  local ver="$1" cp="$2" tag="$3"; shift 3
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
    for ver in r16 r17; do
      if [ "$ver" = r16 ]; then CP="$R16CP"; else CP="$R17CP"; fi
      echo "=== focused session $ver #$round ==="
      run_bench "$ver" "$CP" "${ver}_s${round}" \
        SPARK_GRAFT_ITERATIONS=3 SPARK_GRAFT_BENCH_ONLY="$QUERIES"
    done
  done
fi

if [ "$MODE" = ordering ] || [ "$MODE" = all ]; then
  # full-pass order lists are built by the caller into $OUT/order_*.txt
  # (default order from a detail JSON; 'first'/'last' move ss_ann_lsh_det)
  for ord in driver first last; do
    LIST=$(cat "$OUT/order_${ord}.txt")
    for ver in r16 r17; do
      if [ "$ver" = r16 ]; then CP="$R16CP"; else CP="$R17CP"; fi
      echo "=== full-pass $ver order=$ord ==="
      run_bench "$ver" "$CP" "full_${ver}_${ord}" \
        SPARK_GRAFT_ITERATIONS=1 SPARK_GRAFT_BENCH_ONLY="$LIST"
    done
  done
fi
echo DONE
