package graft

import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession

/** CDC-replay scaling benchmark — the two-cluster-size protocol from
  * BASELINE.md, run honestly on one box:
  *
  * Each leg runs in its OWN child JVM pinned with `taskset` to exactly N
  * cores (and `-XX:ActiveProcessorCount=N`), because in a single unpinned
  * JVM a `local[2]` run borrows idle cores for GC/IO threads, silently
  * inflating the small-N baseline — a real cluster cgroup-binds executors,
  * and the pinning emulates that. A child invocation warms up once (JIT)
  * and then times SEVERAL replay reps back-to-back, so the marginal rep
  * costs only the replay itself — extra samples are cheap, which is what
  * noise robustness needs.
  *
  * Around every timed rep the child reads /proc/stat for its pinned CPU
  * set and reports the EXTERNAL load (other processes + hypervisor steal)
  * that ran on those cores during the rep — the kernel's own accounting of
  * measurement contamination. The parent feeds all reps into
  * [[ScalingEstimator]] (min-of-K, kernel-certified clean-window min, and
  * paired per-round estimators) and adaptively spends the time budget on
  * the leg that most limits the estimate. See ScalingEstimator's scaladoc
  * for why each estimator is honest under one-sided noise.
  *
  * Knobs (env): SPARK_GRAFT_BENCH_EVENTS (default 8M), _BATCHES (1),
  * _BUCKETS (16), _SALT (4), _REPOS (2000), _PATHS (200),
  * _REPS_N / _REPS_4N (reps per child invocation), _BUDGET (secs),
  * SPARK_GRAFT_CORES_LIST ("2,8"), SPARK_GRAFT_BENCH_AQE, _WORK.
  */
object BenchCdc {
  implicit private class BuilderOps(b: SparkSession.Builder) {
    def applyExtra(): SparkSession.Builder = {
      sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach(_.split(';').filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      })
      b
    }
  }

  def session(cpus: Int): SparkSession = {
    val s = Sessions.builder(s"graft-cdc-bench-$cpus", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_AQE", "false"))
      // keep the shuffle at 2×cores partitions: AQE's size-based coalescing
      // would fold this medium shuffle into ~12 partitions and strand the
      // extra cores at 4N — parallelism matters more than partition size here
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // shuffle spill files on tmpfs: the bench measures compute scaling,
      // not the sandbox's single virtio disk (a real cluster has
      // per-executor local disks)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.memory.offHeap.enabled",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OFFHEAP", "true"))
      .config("spark.memory.offHeap.size", "6g")
      // extra confs: "k=v;k=v" passthrough for experiments
      .applyExtra()
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def rm(dir: String): Unit = {
    def loop(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    val f = new java.io.File(dir)
    if (f.exists()) loop(f)
  }

  private def envInt(k: String, d: Int) = sys.env.getOrElse(k, d.toString).toInt
  private def envLong(k: String, d: Long) = sys.env.getOrElse(k, d.toString).toLong

  private[graft] case class Cfg(nEvents: Long, nBatches: Int, buckets: Int, salt: Int,
                                nRepos: Int, pathsPerRepo: Int, format: String) {
    def work: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_WORK", "/dev/shm") +
      s"/graft-cdc-$format-$nEvents-$nBatches-$nRepos-$pathsPerRepo"
    def logDir = s"$work/log"
    def warmLogDir = s"$work/warmlog"
  }

  /** The env-derived bench config, for the phase-decomposition probe
    * (tools.ReplayProbe) — same knobs, same log. */
  private[graft] def probeCfg: Cfg = cfgFromEnv

  private def cfgFromEnv = cfgForBatches(envInt("SPARK_GRAFT_BENCH_BATCHES", 1))

  private def cfgForBatches(rawBatches: Int): Cfg = {
    val nEvents = envLong("SPARK_GRAFT_BENCH_EVENTS", 8000000L)
    // more batches than events: ChangeGen skips the empty tail dirs, so
    // ensureLogs' last-batch sentinel would never exist and every run
    // would silently regenerate from scratch — clamp loudly instead
    val batches = math.min(rawBatches.toLong, math.max(1L, nEvents)).toInt
    if (batches != rawBatches)
      System.err.println(s"bench batches=$rawBatches exceeds " +
        s"EVENTS=$nEvents; clamped to $batches")
    cfgWith(nEvents, batches)
  }

  private def cfgWith(nEvents: Long, nBatches: Int) = Cfg(
    nEvents = nEvents,
    nBatches = nBatches,
    buckets = envInt("SPARK_GRAFT_BENCH_BUCKETS", 16),
    // salt 16: the workload's 30%-hot repo makes ONE bucket hold 30% of
    // the batch; at salt 4 its window partitions were ~6.5× the average
    // and the straggler task capped the 8-core leg (measured 17.2 s floor,
    // fully-warm scaling 0.64). Fanning the hot bucket 16 ways cut the
    // 8-core leg to 14.8 s (542k events/s) and scaling to 0.84+; salt 32
    // also clears but pays more files and per-task overhead on the small
    // leg. This is the engine's own skew lever (north rule) doing its job.
    salt = envInt("SPARK_GRAFT_BENCH_SALT", 16),
    nRepos = envInt("SPARK_GRAFT_BENCH_REPOS", 2000),
    pathsPerRepo = envInt("SPARK_GRAFT_BENCH_PATHS", 200),
    format = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORMAT", "json"))

  /** Generate the timed log + a small warmup log if not present. Both
    * sentinels are checked (a run interrupted between the two writeLogs
    * would otherwise leave warmups as SILENT no-ops forever — a missing
    * warm dir replays an empty batch list without error), and both are
    * re-verified after generation so a probe/generator mismatch fails
    * loudly instead of regenerating on every run. */
  def ensureLogs(cfg: Cfg): Unit = {
    val timedSentinel = new java.io.File(f"${cfg.logDir}/batch-${cfg.nBatches - 1}%05d")
    val warmSentinel = new java.io.File(s"${cfg.warmLogDir}/batch-00000")
    if (!timedSentinel.exists() || !warmSentinel.exists()) {
      rm(cfg.work)
      val sg = session(32)
      ChangeGen.writeLog(sg,
        GenConfig(nEvents = cfg.nEvents, nRepos = cfg.nRepos, pathsPerRepo = cfg.pathsPerRepo),
        cfg.logDir, nBatches = cfg.nBatches, partitions = 64, format = cfg.format)
      ChangeGen.writeLog(sg,
        GenConfig(seed = 7L, nEvents = math.min(cfg.nEvents, 500000L),
          nRepos = cfg.nRepos, pathsPerRepo = cfg.pathsPerRepo),
        cfg.warmLogDir, nBatches = 1, partitions = 32, format = cfg.format)
      sg.stop()
      require(timedSentinel.exists() && warmSentinel.exists(),
        s"log generation left no ${timedSentinel} / ${warmSentinel} — " +
          "generator batch layout disagrees with the sentinel probe")
    }
  }

  // ----- external-load measurement (kernel accounting, Linux only) -------

  /** Sum of (busy, steal) jiffies over the given cpu ids from /proc/stat.
    * busy = user+nice+system+irq+softirq (iowait counts as idle). USER_HZ
    * is ABI-fixed at 100 on Linux. Returns None when unreadable. */
  private[graft] def cpuJiffies(cpus: Range): Option[(Long, Long)] = {
    if (cpus.isEmpty) return None
    try {
      val want = cpus.map(i => s"cpu$i").toSet
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).toArray.map(_.toString)
      val picked = lines.filter(l => want.contains(l.takeWhile(_ != ' ')))
      if (picked.length != cpus.size) None
      else {
        var busy = 0L; var steal = 0L
        picked.foreach { l =>
          val f = l.trim.split("\\s+")
          // cpuN user nice system idle iowait irq softirq steal ...
          busy += f(1).toLong + f(2).toLong + f(3).toLong + f(6).toLong + f(7).toLong
          steal += (if (f.length > 8) f(8).toLong else 0L)
        }
        Some((busy, steal))
      }
    } catch { case _: Throwable => None }
  }

  private def ownCpuSecs(): Double = {
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }
  }

  private def gcSecs(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum / 1e3
  }

  /** One timed replay inside the child; returns (secs, rows, extCores,
    * gcSecs). extCores is the external busy+steal load measured over the
    * given cpu set while the rep ran (-1 when unmeasurable). Callers pass
    * the PINNED set: that is what CleanExtCores is calibrated against,
    * and own CPU time subtracts cleanly there (taskset confines it). A
    * co-tenant on far cores still bleeds in through the shared memory
    * subsystem, but counting it directly would make clean reps
    * unobtainable on any shared host. */
  private def timedRep(spark: SparkSession, cfg: Cfg, tableDir: String,
                       cpuSet: Range): (Double, Long, Double, Double) = {
    rm(tableDir)
    val j0 = cpuJiffies(cpuSet)
    val c0 = ownCpuSecs()
    val g0 = gcSecs()
    val t0 = System.nanoTime()
    ingest.BatchReplay.replay(spark, cfg.logDir, new LakeTable(spark, tableDir),
      numBuckets = cfg.buckets, saltBuckets = cfg.salt, recordMeta = false,
      shaColumn = true, format = cfg.format)
    val secs = (System.nanoTime() - t0) / 1e9
    val c1 = ownCpuSecs()
    val g1 = gcSecs()
    val ext = (j0, cpuJiffies(cpuSet)) match {
      case (Some((b0, s0)), Some((b1, s1))) if c0 >= 0 && c1 >= 0 =>
        val totalSecs = (b1 - b0 + s1 - s0) / 100.0 // USER_HZ = 100
        math.max(0.0, (totalSecs - (c1 - c0)) / secs)
      case _ => -1.0
    }
    val rows = new LakeTable(spark, tableDir).read().count()
    (secs, rows, ext, g1 - g0)
  }

  /** The child's pinned cpu set: GRAFT_CHILD_CPUSET ("lo-hi") when the
    * parent pinned it off the default 0..cpus-1 block (the stepped 2-core
    * child runs on the TOP cores so the two persistent children never
    * share a pinned set), else 0 until cpus. */
  private[graft] def pinnedSet(cpus: Int): Range =
    parseCpuset(sys.env.get("GRAFT_CHILD_CPUSET"), cpus)

  private[graft] def parseCpuset(v: Option[String], cpus: Int): Range =
    v match {
      case Some(s) if s.matches("\\d+-\\d+") =>
        val Array(lo, hi) = s.split('-').map(_.toInt)
        if (lo <= hi && hi - lo + 1 == cpus) lo to hi else 0 until cpus
      case _ => 0 until cpus
    }

  /** Child-JVM entry: JIT warmup on the small log, then `reps` timed
    * replays back-to-back, one CHILD_REP line each. Runs pinned. */
  def childMain(cpus: Int, reps: Int, cfg: Cfg): Unit = {
    val spark = warmedSession(cpus, cfg)
    // measure external load over the PINNED set (taskset binds this child
    // to its cpu set, so all own CPU time lands there and subtracts
    // cleanly) — matching ScalingEstimator.CleanExtCores' calibration. A
    // whole-host reading would count co-tenants on far cores and make
    // "clean" unobtainable on any shared box.
    val pinned = pinnedSet(cpus)
    val tableDir = s"${cfg.work}/table_$cpus"
    try
      (1 to reps).foreach { _ =>
        val (secs, rows, ext, gc) = timedRep(spark, cfg, tableDir, pinned)
        println(f"CHILD_REP $secs%.3f,$rows,$ext%.3f,$gc%.3f")
      }
    finally {
      // the table lives on tmpfs (host RAM): clean even when a rep threw
      rm(tableDir)
      spark.stop()
    }
  }

  /** Child with ADAPTIVE floor-hunting for environments where the parent
    * cannot interleave legs (the standalone-cluster script: executors are
    * separate JVMs per spark-submit, so per-leg JIT warmup and window
    * luck used to decide a whole leg on a fixed rep count). Runs timed
    * reps until the leg's floor stops improving — stop once ≥ `minReps`
    * drawn AND the best time has not improved by >1% for `patience`
    * consecutive reps — bounded by `maxReps` and `budgetSecs`. Early
    * (JIT-cold or noise-inflated) reps simply never become the minimum;
    * a degraded window buys more draws instead of sinking the leg.
    * Prints the same CHILD_REP lines as the fixed-rep child. */
  def childAdaptMain(cpus: Int, minReps: Int, maxReps: Int, patience: Int,
                     budgetSecs: Long, cfg: Cfg): Unit = {
    // unlike child/childstep (whose parent runScaling generates the log),
    // adapt mode has no parent — a fresh box must not replay a MISSING
    // log as a silent no-op (listBatches returns empty) and die on read
    ensureLogs(cfg)
    val spark = warmedSession(cpus, cfg)
    val pinned = pinnedSet(cpus)
    val tableDir = s"${cfg.work}/table_${cpus}_adapt"
    val t0 = System.nanoTime()
    var best = Double.MaxValue
    var sinceImprove = 0
    var n = 0
    try {
      var continue = true
      while (continue) {
        val (secs, rows, ext, gc) = timedRep(spark, cfg, tableDir, pinned)
        n += 1
        if (secs < best * 0.99) sinceImprove = 0 else sinceImprove += 1
        best = math.min(best, secs)
        println(f"CHILD_REP $secs%.3f,$rows,$ext%.3f,$gc%.3f")
        System.out.flush()
        val elapsed = (System.nanoTime() - t0) / 1e9
        continue = n < maxReps && elapsed < budgetSecs &&
          !(n >= minReps && sinceImprove >= patience)
      }
    } finally {
      rm(tableDir)
      spark.stop()
    }
  }

  private def warmedSession(cpus: Int, cfg: Cfg): SparkSession = {
    val spark = session(cpus)
    val warmDir = s"${cfg.work}/table_${cpus}_warm"
    rm(warmDir)
    ingest.BatchReplay.replay(spark, cfg.warmLogDir, new LakeTable(spark, warmDir),
      numBuckets = cfg.buckets, saltBuckets = cfg.salt, recordMeta = false,
      shaColumn = true, format = cfg.format)
    rm(warmDir)
    spark
  }

  /** Persistent stepping child: warm up once, print CHILD_READY, then run
    * ONE timed rep per "rep" line on stdin (CHILD_REP line each); any
    * other line or EOF exits. Keeping the JVM alive makes the marginal
    * draw cost the rep alone — no 30 s re-warm per sample — which is what
    * lets the parent interleave the two legs at REP granularity: tight
    * shared windows for the paired estimator, and 2-3× more floor-hunting
    * draws for min-of-K inside the same budget. */
  def childStepMain(cpus: Int, cfg: Cfg): Unit = {
    val spark = warmedSession(cpus, cfg)
    val pinned = pinnedSet(cpus)
    val tableDir = s"${cfg.work}/table_${cpus}_step"
    println("CHILD_READY")
    System.out.flush()
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    try {
      var line = in.readLine()
      while (line != null && line.trim == "rep") {
        val (secs, rows, ext, gc) = timedRep(spark, cfg, tableDir, pinned)
        println(f"CHILD_REP $secs%.3f,$rows,$ext%.3f,$gc%.3f")
        System.out.flush()
        line = in.readLine()
      }
    } finally {
      // tmpfs-resident table: reclaim host RAM even on a throwing rep
      rm(tableDir)
      spark.stop()
    }
  }

  /** The pinned-child command line (shared by the batch and stepping
    * protocols): same JVM surface flags as this parent, taskset-pinned. */
  private def childCmd(cpus: Int, cpuset: String, args: Seq[String]): Seq[String] = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Xmx") || a.startsWith("-D"))
    val extra = sys.env.get("SPARK_GRAFT_CHILD_JVM_OPTS")
      .map(_.split(' ').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    Seq("taskset", "-c", cpuset, javaBin) ++ jvmArgs ++ extra ++
      Seq(s"-XX:ActiveProcessorCount=$cpus", "-cp", cp, "graft.BenchCdc") ++ args
  }

  /** Upper bound on one child rep (incl. the one-off JVM+Spark warmup
    * before CHILD_READY). Generous vs the ~15-110 s observed range; a
    * rep exceeding it is treated as wedged and its child replaced. */
  private val RepTimeoutSecs: Long =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REP_TIMEOUT", "900").toLong

  /** A persistent pinned stepping child (see [[childStepMain]]): spawn +
    * warm once, then each `step()` runs exactly one timed rep. `None` from
    * step() means the child died — callers fall back to the batch path. */
  private final class SteppedChild(cpus: Int, cpuset: String,
                                   extraEnv: Map[String, String] = Map.empty) {
    private val pb = new ProcessBuilder(
      childCmd(cpus, cpuset, Seq("childstep", cpus.toString)): _*)
    sys.env.foreach { case (k, v) => pb.environment().put(k, v) }
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.environment().put("GRAFT_CHILD_CPUSET", cpuset)
    private val p = pb.start()
    // drain stderr (Spark INFO noise) so the child can never block on a
    // full pipe
    locally {
      val t = new Thread(() => {
        val buf = new Array[Byte](8192)
        try { while (p.getErrorStream.read(buf) >= 0) () } catch { case _: Throwable => () }
      })
      t.setDaemon(true)
      t.start()
    }
    private val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    private val in = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(p.getOutputStream))

    /** Read lines until one starts with `prefix`, giving up (None) at the
      * deadline — a WEDGED child rep (deadlocked task, full tmpfs) must
      * not hang the whole bench past its budget; readLine alone would
      * block forever. Polls ready() so the block happens only when a
      * line is (at least partially) available. ready() is false at EOF
      * too, so a DEAD child (exited, pipe drained) is detected explicitly
      * — without that check a crash would spin the full timeout per step
      * where the old blocking readLine saw null immediately. */
    private def readUntil(prefix: String, timeoutSecs: Long): Option[String] = {
      val deadline = System.nanoTime() + timeoutSecs * 1000L * 1000 * 1000
      while (System.nanoTime() < deadline) {
        if (out.ready()) {
          val line = out.readLine()
          if (line == null) return None
          if (line.startsWith(prefix)) return Some(line)
        } else if (!p.isAlive) {
          return None // child exited and its pipe is drained
        } else Thread.sleep(100)
      }
      None
    }

    /** Blocks through the child's warmup; false = child unusable. */
    val ready: Boolean =
      try readUntil("CHILD_READY", RepTimeoutSecs).isDefined
      catch { case _: Throwable => false }

    /** One timed rep: (secs, rows, extCores, gcSecs); None = dead OR
      * wedged past [[RepTimeoutSecs]] (callers close + fall back). */
    def step(): Option[(Double, Long, Double, Double)] =
      try {
        in.write("rep\n"); in.flush()
        readUntil("CHILD_REP ", RepTimeoutSecs).map(parseChildRep)
      } catch { case _: Throwable => None }

    def close(): Unit = {
      try { in.write("exit\n"); in.flush() } catch { case _: Throwable => () }
      try {
        if (!p.waitFor(15, java.util.concurrent.TimeUnit.SECONDS))
          p.destroyForcibly(): Unit
      } catch { case _: Throwable => p.destroyForcibly(): Unit }
    }
  }

  /** One CHILD_REP wire line → (secs, rows, extCores, gcSecs). The single
    * decoder for both the stepped and batch protocols — the format lives
    * in [[childMain]]/[[childStepMain]]'s println and here, nowhere else. */
  private def parseChildRep(l: String): (Double, Long, Double, Double) = {
    val f = l.stripPrefix("CHILD_REP ").split(',')
    (f(0).toDouble, f(1).toLong, f(2).toDouble,
      if (f.length > 3) f(3).toDouble else -1.0)
  }

  /** Spawn a pinned child running `reps` timed replays; parse its per-rep
    * lines. `cpuset` is the child's core set — callers MUST pass the same
    * set the leg's stepped child used (the N-core leg pins to the TOP
    * cores when both stepped children coexist), else this fallback would
    * overlap the surviving sibling's pinned cores and contaminate exactly
    * the measurement the disjoint guard protects. Falls back to ONE
    * in-process unpinned rep if the child cannot run (missing taskset,
    * cpuset-denied mask, crash) — an aborted bench helps nobody; fallback
    * reps carry ext = [[ScalingEstimator.UnpinnedExt]], which EXCLUDES
    * them from the minima whenever the leg has pinned evidence (an
    * unpinned local[N] borrows idle cores and would overstate the leg). */
  private def measurePinned(cpus: Int, reps: Int, cfg: Cfg,
                            cpuset: String,
                            extraEnv: Map[String, String] = Map.empty)
      : ScalingEstimator.LegResult = {
    val cmd = childCmd(cpus, cpuset, Seq("child", cpus.toString, reps.toString))
    def fallback(reason: String): ScalingEstimator.LegResult = {
      System.err.println(s"pinned child failed ($reason); running in-process unpinned")
      val spark = session(cpus)
      try {
        val warmDir = s"${cfg.work}/table_${cpus}_warm"
        rm(warmDir)
        ingest.BatchReplay.replay(spark, cfg.warmLogDir, new LakeTable(spark, warmDir),
          numBuckets = cfg.buckets, saltBuckets = cfg.salt, recordMeta = false,
          shaColumn = true, format = cfg.format)
        rm(warmDir)
        val tableDir = s"${cfg.work}/table_$cpus"
        val (secs, rows, _, _) = timedRep(spark, cfg, tableDir, 0 until 0)
        rm(tableDir)
        ScalingEstimator.LegResult(Seq((secs, ScalingEstimator.UnpinnedExt)), rows)
      } finally spark.stop()
    }
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      sys.env.foreach { case (k, v) => pb.environment().put(k, v) }
      extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
      // aim the child's /proc/stat accounting at ITS cpuset (a stepping
      // child's leaked env value would mis-aim it)
      if (cpuset == s"0-${cpus - 1}") pb.environment().remove("GRAFT_CHILD_CPUSET")
      else pb.environment().put("GRAFT_CHILD_CPUSET", cpuset)
      val p = pb.start()
      // collect stdout on a thread so a bounded waitFor can kill a WEDGED
      // child (readAllBytes first would block past any budget)
      val outBuf = new java.io.ByteArrayOutputStream()
      val collector = new Thread(() => {
        try p.getInputStream.transferTo(outBuf): Unit
        catch { case _: Throwable => () }
      })
      collector.setDaemon(true)
      collector.start()
      val budget = RepTimeoutSecs * (reps + 1) // + warmup
      if (!p.waitFor(budget, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly(): Unit
        p.waitFor(15, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
      collector.join(2000)
      val out = outBuf.toString(java.nio.charset.StandardCharsets.UTF_8)
      val exit = if (p.isAlive) -1 else p.exitValue()
      val repLines = out.linesIterator.filter(_.startsWith("CHILD_REP ")).toSeq
      if (exit == 0 && repLines.nonEmpty) {
        val parsed = repLines.map(parseChildRep)
        val rows = parsed.map(_._2).distinct
        require(rows.size == 1, s"child reps disagree on final rows: $rows")
        parsed.foreach { case (s, _, e, g) =>
          println(f"""{"cores":$cpus,"rep_secs":$s%.2f,"ext_cores":$e%.2f,"gc_secs":$g%.2f}""")
        }
        ScalingEstimator.LegResult(parsed.map(p0 => (p0._1, p0._3)), rows.head)
      } else {
        System.err.println(out.takeRight(2000))
        fallback(if (exit != 0) s"exit code $exit" else "no CHILD_REP lines")
      }
    } catch {
      case e: java.io.IOException => fallback(e.getMessage) // no taskset (non-Linux)
    }
  }

  /** Guard-excluded paired rounds as JSON — one shape for both mains. */
  private[graft] def pairedExcludedJson(e: ScalingEstimator.Estimates): String =
    e.pairedExcluded
      .map { case (nSecs, eff) => f"""{"secs_n":$nSecs%.2f,"eff":$eff%.3f}""" }
      .mkString("[", ",", "]")

  final case class ScalingResult(nEvents: Long,
                                 nCores: Int, mCores: Int,
                                 est: ScalingEstimator.Estimates,
                                 reps: Seq[ScalingEstimator.Rep],
                                 rows: Long,
                                 /** Epoch count actually measured (post
                                   * clamp) — reporters must echo this,
                                   * not their requested value. */
                                 nBatches: Int = 1) {
    def throughput(cpus: Int): Long = (nEvents / est.minSecs(cpus)).toLong
  }

  /** The full two-cluster-size protocol; prints per-rep progress, returns
    * all reps + estimates. See ScalingEstimator for the estimator design
    * and the adaptive sampling policy. */
  def runScaling(coreList: Seq[Int],
                 budgetSecs: Int = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1320").toInt,
                 targetEff: Double = 0.8,
                 /** Epoch count override (INCREMENTAL-replay mode: the
                   * same log split into N batch dirs, one ledgered MERGE
                   * commit each — the production stage-resumable path).
                   * None = the env-driven config (driver default 1 =
                   * single-epoch backfill). Children re-derive their
                   * config from env, so the override rides to them as
                   * SPARK_GRAFT_BENCH_BATCHES. */
                 nBatches: Option[Int] = None): ScalingResult = {
    val cfg = nBatches.map(cfgForBatches).getOrElse(cfgFromEnv)
    val extraEnv = nBatches
      .map(b => Map("SPARK_GRAFT_BENCH_BATCHES" -> b.toString)).getOrElse(Map.empty)
    ensureLogs(cfg)
    val (nC, mC) = (coreList.head, coreList.last)
    // Persistent stepping children (one per core level) make the marginal
    // draw cost the rep itself instead of rep + 30 s JVM warmup, so the
    // budget buys 2-3× more samples AND each adaptive round's legs share
    // a tight (~2 min) host window — exactly what the paired estimator
    // needs. The N-core child pins to the TOP cores so the two pinned
    // sets never overlap (the idle child's JVM housekeeping stays off the
    // measured set). Reps per round: 1 N-leg draw + 3 4N-leg draws (the
    // 4N leg is the noise victim; its draws are 3-4× cheaper).
    val repsN = envInt("SPARK_GRAFT_BENCH_REPS_N", 1)
    val repsM = envInt("SPARK_GRAFT_BENCH_REPS_4N", 3)
    val avail = Runtime.getRuntime.availableProcessors
    // Persistent children only when the two pinned sets can be DISJOINT;
    // otherwise the idle sibling JVM's housekeeping lands on the measured
    // cpu set during every timed rep (contamination the batch protocol —
    // children never coexist — does not have). Small hosts get the batch
    // protocol, loudly.
    val disjoint = nC == mC || avail >= mC + nC
    if (!disjoint)
      System.err.println(s"pinned sets for $nC+$mC cores would overlap on " +
        s"$avail available processors; using the batch protocol (children never coexist)")
    // A batch child pays the full JVM+Spark warmup per spawn; when the
    // stepped path is unavailable, amortize it over at least the old
    // batch protocol's per-spawn rep counts (2 N-leg / 6 4N-leg draws)
    // instead of the stepped path's cheap per-round asks.
    def batchReps(cores: Int, n: Int): Int =
      math.max(n, if (cores == mC && nC != mC) 6 else 2)
    val children = scala.collection.mutable.Map.empty[Int, Option[SteppedChild]]
    // ONE cpuset rule for a leg, shared by the stepped child AND the
    // batch fallback: under the disjoint (stepped) regime the N-core leg
    // lives on the TOP cores — a fallback child pinned to 0..n-1 there
    // would overlap the surviving mC stepped sibling's cores, inflating
    // the very reps the disjoint guard exists to keep clean
    def cpusetFor(cores: Int): String =
      if (disjoint && cores == nC && nC != mC) s"${avail - nC}-${avail - 1}"
      else s"0-${cores - 1}"
    def childFor(cores: Int): Option[SteppedChild] =
      children.getOrElseUpdate(cores, {
        if (!disjoint) None
        else {
          val cpuset = cpusetFor(cores)
          try {
            val c = new SteppedChild(cores, cpuset, extraEnv)
            if (c.ready) Some(c)
            else { c.close(); System.err.println(s"stepped child ($cores cores) failed to warm; batch fallback"); None }
          } catch { case e: Throwable =>
            System.err.println(s"stepped child ($cores cores) unavailable (${e.getMessage}); batch fallback")
            None
          }
        }
      })
    val runLeg: (Int, Int) => ScalingEstimator.LegResult = (cores, n) =>
      childFor(cores) match {
        case Some(c) =>
          val want = math.max(1, n) // a 0-rep ask would make fromChild.get below unsound
          val drawn = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Double, Double)]
          var died = false
          while (drawn.length < want && !died) {
            c.step() match {
              case Some(r) => drawn += r
              case None => // child died mid-leg: top up from the batch path
                died = true
                children(cores) = None
                c.close()
                System.err.println(
                  s"stepped child ($cores cores) died after ${drawn.length}/$want draws; batch fallback for the rest")
            }
          }
          val fromChild: Option[ScalingEstimator.LegResult] =
            if (drawn.isEmpty) None
            else {
              val rows = drawn.map(_._2).distinct
              require(rows.size == 1, s"child reps disagree on final rows: $rows")
              drawn.foreach { case (s, _, e, g) =>
                println(f"""{"cores":$cores,"rep_secs":$s%.2f,"ext_cores":$e%.2f,"gc_secs":$g%.2f}""")
              }
              Some(ScalingEstimator.LegResult(drawn.toSeq.map(r => (r._1, r._3)), rows.head))
            }
          if (!died) fromChild.get // loop only exits undied with all n drawn
          else {
            val batch = measurePinned(cores, batchReps(cores, want - drawn.length),
              cfg, cpusetFor(cores), extraEnv)
            fromChild match {
              case Some(cr) =>
                require(cr.rows == batch.rows,
                  s"stepped and batch reps disagree on final rows: ${cr.rows} vs ${batch.rows}")
                ScalingEstimator.LegResult(cr.reps ++ batch.reps, cr.rows)
              case None => batch
            }
          }
        case None => measurePinned(cores, batchReps(cores, n), cfg, cpusetFor(cores), extraEnv)
      }
    val t0 = System.nanoTime()
    try {
      val (reps, rows) = ScalingEstimator.adaptive(
        nC, mC, repsN, repsM,
        // cheap rounds (no per-round warmups) widen phase 1; phase 2 then
        // spends the remainder on whichever leg blocks the estimate
        minRounds = 2, maxRounds = envInt("SPARK_GRAFT_BENCH_REPS", 6),
        budgetSecs = budgetSecs, targetEff = targetEff,
        runLeg = runLeg,
        elapsed = () => (System.nanoTime() - t0) / 1e9)
      ScalingResult(cfg.nEvents, nC, mC, ScalingEstimator.estimate(reps, nC, mC), reps, rows,
        nBatches = cfg.nBatches)
    } finally children.values.flatten.foreach(_.close())
  }

  /** SPARK_GRAFT_CORES_LIST parsed + VALIDATED — the one entry point for
    * both mains (Bench previously parsed it unvalidated: an over-avail
    * core count silently degraded every leg to the unpinned fallback
    * with local[N] oversubscribing the host, printing normal-looking but
    * meaningless numbers). */
  private[graft] def coreListFromEnv(): Seq[Int] = {
    val coreList = sys.env.getOrElse("SPARK_GRAFT_CORES_LIST", "2,8")
      .split(',').map(_.trim.toInt).toSeq
    val avail = Runtime.getRuntime.availableProcessors
    require(coreList.forall(c => c >= 1 && c <= avail),
      s"SPARK_GRAFT_CORES_LIST $coreList exceeds available processors ($avail)")
    if (coreList.size > 2)
      System.err.println(s"two-cluster protocol measures only the first and " +
        s"last of SPARK_GRAFT_CORES_LIST; ignoring ${coreList.tail.init.mkString(",")}")
    coreList
  }

  def main(args: Array[String]): Unit = {
    // CHILD_REP and the JSON result lines are machine-parsed; pin the
    // default locale so f"%.3f" never emits comma decimal separators.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    if (args.length >= 2 && args(0) == "child") {
      val reps = if (args.length >= 3) args(2).toInt else 1
      childMain(args(1).toInt, reps, cfgFromEnv)
      sys.exit(0)
    }
    if (args.length >= 2 && args(0) == "childstep") {
      childStepMain(args(1).toInt, cfgFromEnv)
      sys.exit(0)
    }
    if (args.length >= 2 && args(0) == "childadapt") {
      def a(i: Int, d: Int) = if (args.length > i) args(i).toInt else d
      childAdaptMain(args(1).toInt, minReps = a(2, 3), maxReps = a(3, 12),
        patience = a(4, 3), budgetSecs = a(5, 600).toLong, cfgFromEnv)
      sys.exit(0)
    }
    val coreList = coreListFromEnv()
    val r = runScaling(coreList)
    Seq(r.nCores, r.mCores).distinct.foreach { cpus =>
      println(f"""{"cores":$cpus,"secs":${r.est.minSecs(cpus)}%.2f,"events_per_sec":${r.throughput(cpus)},"rows":${r.rows}}""")
    }
    println(f"""{"scaling":"${r.nCores}->${r.mCores}","efficiency":${r.est.headline}%.3f,""" +
      f""""min_of_k":${r.est.effMinOfK}%.3f,"clean":${r.est.effClean.getOrElse(-1.0)}%.3f,""" +
      f""""paired_median":${r.est.effPairedMedian.getOrElse(-1.0)}%.3f,""" +
      f""""paired_best":${r.est.effPairedBest.getOrElse(-1.0)}%.3f,""" +
      s""""paired_excluded":${pairedExcludedJson(r.est)}}""")
  }
}
