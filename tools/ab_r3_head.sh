#!/bin/bash
# Interleaved same-window A/B: round-3 engine (5dd91f9, worktree
# /tmp/r3-engine) vs current HEAD, 8-core CDC replay legs, to decide
# whether the 8-core best-rep drift (17.1 s Aug-18 -> 19.45 s Aug-19)
# is an engine regression or host drift. Phase timers on for both.
set -u
SPARK_JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
CUR_CP="/root/repo/target/scala-2.13/classes:${SPARK_JARS%:}"
R3_CP="/tmp/r3-engine/target/scala-2.13/classes:${SPARK_JARS%:}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JOPTS="$ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g"
export GRAFT_MERGE_DEBUG=1

run_cur() { # cores reps
  taskset -c 0-$(($1-1)) java $JOPTS -XX:ActiveProcessorCount=$1 \
    -cp "$CUR_CP" graft.BenchCdc child "$1" "$2" 2>/dev/null \
    | grep -E 'CHILD_REP|merge_phase' | sed "s/^/cur$1 /"
}
run_r3() { # cores (1 rep per child)
  taskset -c 0-$(($1-1)) java $JOPTS -XX:ActiveProcessorCount=$1 \
    -cp "$R3_CP" graft.BenchCdc child "$1" 2>/dev/null \
    | grep -E 'CHILD_RESULT|merge_phase' | sed "s/^/r3-$1 /"
}

ROUNDS=${1:-3}
for rep in $(seq 1 "$ROUNDS"); do
  echo "# round $rep"
  run_cur 8 2
  run_r3 8
  run_r3 8
done
