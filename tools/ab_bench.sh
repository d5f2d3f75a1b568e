#!/bin/bash
# Interleaved same-window engine A/B for the CDC scaling protocol
# (VERDICT round-2 item 7): round-1 engine classes vs current classes,
# identical pinned-child protocol (graft.BenchCdc child), identical
# pre-generated 8M-event JSON log, legs interleaved
# (cur2, cur8, r1-2, r1-8) x K so host noise hits both engines equally.
# Results recorded in BASELINE.md.
set -u
SPARK_JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
CUR_CP="/root/repo/target/scala-2.13/classes:${SPARK_JARS%:}"
R1_CP="/tmp/r1-engine/target/scala-2.13/classes:${SPARK_JARS%:}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JOPTS="$ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g"

run_leg() { # engine cp cores
  local engine=$1 cp=$2 cores=$3
  local out
  out=$(taskset -c 0-$((cores-1)) java $JOPTS -XX:ActiveProcessorCount=$cores \
        -cp "$cp" graft.BenchCdc child $cores 2>/dev/null | grep CHILD_RESULT)
  local secs=${out#CHILD_RESULT }
  secs=${secs%%,*}
  echo "{\"engine\":\"$engine\",\"cores\":$cores,\"secs\":$secs}"
}

REPS=${1:-3}
for rep in $(seq 1 "$REPS"); do
  echo "# rep $rep"
  run_leg cur "$CUR_CP" 2
  run_leg cur "$CUR_CP" 8
  run_leg r1  "$R1_CP" 2
  run_leg r1  "$R1_CP" 8
done
