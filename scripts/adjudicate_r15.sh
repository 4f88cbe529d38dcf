#!/bin/bash
# Round-15 adjudication of the two BENCH_r14 driver-run outliers
# (ss_ann_lsh_det 3.29x, dd_embed_lsh_10x 2.08x vs the r13 driver run):
# interleaved fresh-JVM focused sessions of the r13 binary (git worktree
# at 2d29c75, compiled) vs the r14/r15 head, 3 iterations per query per
# session, q01 + micro_full_table_scan as ambient-drift controls.
# Usage: bash scripts/adjudicate_r15.sh <r13_classes_dir> <out_dir>
set -e
R13CP="${1:-/tmp/graft-r13/target/scala-2.13/classes}"
R14CP=/root/repo/target/scala-2.13/classes
OUT="${2:-/tmp/adj_r15}"
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
QUERIES=q01_pricing_summary,micro_full_table_scan,ss_ann_lsh_det,dd_embed_lsh_10x

for round in 1 2 3; do
  for ver in r13 r14; do
    if [ "$ver" = r13 ]; then CP="$R13CP"; else CP="$R14CP"; fi
    echo "=== session $ver #$round ==="
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_ITERATIONS=3 \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_DETAIL="$OUT/${ver}_s${round}.json" \
    java $OPENS -Xmx8g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$CP:$JARS" graft.Bench \
      > "$OUT/${ver}_s${round}.out" 2> "$OUT/${ver}_s${round}.err" \
      || echo "SESSION ${ver}_s${round} FAILED (exit $?)"
  done
done
echo DONE
