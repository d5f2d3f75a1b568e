#!/usr/bin/env bash
# Two-cluster-size CDC scaling on a REAL multi-executor Spark standalone
# cluster (the strongest single-box evidence for the north rule's
# "spark-submit at N and 4N executors" criterion): a standalone master +
# one worker whose process is taskset-pinned to exactly the leg's cores,
# N then 4N one-core executor JVMs (separate processes, real Netty
# shuffle + serde between them), driver pinned to DISJOINT cores so its
# planning/commit work never competes with executors — the single-box
# analogue of a driver node. Each leg runs graft.BenchCdc's child mode
# (JIT warmup + K timed replay reps of the same 8M-event log; prints
# CHILD_REP <secs>,<rows>,... lines). Efficiency = (minN / min4N) / 4.
#
# Usage: tools/cluster_scaling.sh [repsN] [reps4N]
#   requires: sbt package ran (target/scala-2.13/pipelinespark_*.jar),
#   /opt/spark, the BenchCdc log generated (any prior bench run), 16+ cores.
set -euo pipefail
REPS_N="${1:-3}"
REPS_4N="${2:-5}"
export SPARK_HOME=/opt/spark SPARK_LOCAL_IP=127.0.0.1 SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOG_DIR=/tmp/spark-logs SPARK_WORKER_DIR=/tmp/spark-worker
export SPARK_GRAFT_BENCH_OFFHEAP=false   # per-executor heap is sized below
export SPARK_GRAFT_BENCH_EVENTS="${SPARK_GRAFT_BENCH_EVENTS:-8000000}"  # pinned: the
# python below divides by this same value, so a lingering env override
# cannot silently skew the printed events/sec
mkdir -p "$SPARK_LOG_DIR"
JAR=$(ls /root/repo/target/scala-2.13/pipelinespark_*.jar | head -1)

cleanup() {
  "$SPARK_HOME"/sbin/stop-worker.sh  > /dev/null 2>&1 || true
  "$SPARK_HOME"/sbin/stop-master.sh  > /dev/null 2>&1 || true
}
trap cleanup EXIT
cleanup
"$SPARK_HOME"/sbin/start-master.sh --host 127.0.0.1 --port 7077 --webui-port 8090 > /dev/null
sleep 4

leg() { # cores cpuset execMem coresMax reps
  local cores=$1 cpuset=$2 mem=$3 cmax=$4 reps=$5
  "$SPARK_HOME"/sbin/stop-worker.sh > /dev/null 2>&1 || true
  # spark-daemon stop only SIGTERMs and returns: WAIT for the old worker
  # to die, else pgrep below grabs the dying PID (ascending order) and
  # the NEW worker forks executors unpinned — a silently-wrong leg
  for _ in $(seq 1 30); do
    pgrep -f deploy.worker.Worker > /dev/null || break
    sleep 1
  done
  if pgrep -f deploy.worker.Worker > /dev/null; then
    echo "previous worker did not exit" >&2; exit 1
  fi
  "$SPARK_HOME"/sbin/start-worker.sh spark://127.0.0.1:7077 \
    --cores "$cores" --memory 40g --host 127.0.0.1 --webui-port 8091 > /dev/null
  sleep 5
  # spark-daemon's nohup re-parents past the launcher's taskset; pin the
  # live worker instead — executors fork AFTER this and inherit the mask
  local wpid; wpid=$(pgrep -f deploy.worker.Worker | head -1)
  taskset -apc "$cpuset" "$wpid" > /dev/null
  # verify the pin landed (a wrong mask here invalidates the whole leg);
  # taskset prints a 2-element set as "0,1" but a longer range as "0-7"
  local expect="$cpuset"
  [ "$cpuset" = "0-1" ] && expect="0,1"
  taskset -pc "$wpid" | grep -q "affinity list: ${expect}\$" || {
    echo "worker pin failed: $(taskset -pc "$wpid")" >&2; exit 1; }
  # driver on cores 8-15: disjoint from both worker sets (0-1 / 0-7)
  taskset -c 8-15 "$SPARK_HOME"/bin/spark-submit \
    --master spark://127.0.0.1:7077 \
    --class graft.BenchCdc \
    --conf spark.executor.cores=1 \
    --conf spark.executor.memory="$mem" \
    --conf spark.cores.max="$cmax" \
    --conf spark.driver.memory=4g \
    --conf spark.local.dir=/dev/shm/graft-spark-local \
    "$JAR" child "$cores" "$reps" 2>/tmp/cluster_leg_${cores}.err | grep CHILD_REP
  # NB with pipefail, a leg that prints no CHILD_REP aborts here — the
  # diagnostics are in /tmp/cluster_leg_<cores>.err, not discarded
}

echo "== leg N: 2 executors x 1 core (worker pinned 0-1) =="
leg 2 0-1 5g 2 "$REPS_N" | tee /tmp/cluster_leg_n.txt
echo "== leg 4N: 8 executors x 1 core (worker pinned 0-7) =="
leg 8 0-7 4g 8 "$REPS_4N" | tee /tmp/cluster_leg_4n.txt

python3 - <<'EOF'
def best(p):
    secs = [float(l.split()[1].split(',')[0]) for l in open(p) if l.startswith('CHILD_REP')]
    rows = {l.split(',')[1] for l in open(p) if l.startswith('CHILD_REP')}
    assert len(rows) == 1, f'rows diverged: {rows}'
    return min(secs), rows.pop()
import os
EV = float(os.environ['SPARK_GRAFT_BENCH_EVENTS'])
n, rn = best('/tmp/cluster_leg_n.txt')
m, rm = best('/tmp/cluster_leg_4n.txt')
assert rn == rm, f'final state differs across cluster sizes: {rn} vs {rm}'
print(f'2-exec best {n:.2f}s ({EV/n:,.0f} ev/s)  8-exec best {m:.2f}s ({EV/m:,.0f} ev/s)')
print(f'multi-executor scaling efficiency (N->4N executors) = {(n/m)/4:.3f}  rows={rn}')
EOF
