#!/bin/bash
# Round-19 adjudication of the BENCH_r18 driver pass (239.5 s vs r17's
# 124.1 s, 1.93x; median per-row inflation 1.48x INCLUDING unchanged
# controls; worst on commit/DDL-heavy rows — cat_maintenance 2.63 ->
# 25.41 s while the builder's controlled table on the same binary read
# 2.49 s). Standard playbook: interleaved fresh-JVM focused sessions of
# the r17-final binary (git worktree at f6ae5ef, compiled) vs the
# current head, 3 iterations per query per session, the five worst
# driver rows bracketed by q01 + micro_full_table_scan ambient-drift
# controls. The head binary also stamps ambient context (loadavg,
# diskstats deltas, rolling CPU/commit control pair) into the detail
# JSON, so each r19 session carries its own drift signature.
# Usage: bash scripts/adjudicate_r19.sh [r17_classes_dir] [out_dir]
set -e
OLDCP="${1:-/tmp/graft-r17/target/scala-2.13/classes}"
NEWCP=/root/repo/target/scala-2.13/classes
OUT="${2:-/tmp/adj_r19}"
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
QUERIES=q01_pricing_summary,micro_full_table_scan,cat_maintenance,rl_cdc_feed_branch,rl_wap_publish,cat_sql_pipeline,q105_hidden_partitioning

run_bench() { # cp out_tag
  local cp="$1" tag="$2"
  env SPARK_GRAFT_ITERATIONS=3 SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_DETAIL="$OUT/${tag}.json" \
    SPARK_GRAFT_BENCH_JSON="$OUT/${tag}_line.json" \
    java $OPENS -Xmx8g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$cp:$JARS" graft.Bench \
      > "$OUT/${tag}.out" 2> "$OUT/${tag}.err" \
    || echo "SESSION ${tag} FAILED (exit $?)"
}

for round in 1 2 3; do
  for ver in r17 r19; do
    if [ "$ver" = r17 ]; then CP="$OLDCP"; else CP="$NEWCP"; fi
    echo "=== focused session $ver #$round ==="
    run_bench "$CP" "${ver}_s${round}"
  done
done
echo DONE
