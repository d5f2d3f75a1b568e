package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract). Prints ONE JSON line:
  * {"metric":"total","value":<query secs>,"unit":"sec","queries":{...},
  *  "cdc":{...two-cluster-size scaling protocol results...},"sf":...}
  *
  * Part 1 times every operator-demo query on SPARK_GRAFT_SF_DIR.
  * Part 2 runs BenchCdc's scaling protocol (see BenchCdc's scaladoc and
  * BASELINE.md): the same seeded change log replayed in taskset-pinned
  * child JVMs at N and 4N cores, interleaved best-of-reps, reporting
  * events/sec at both and efficiency = (tput_4N / tput_N) / 4.
  */
object Bench {

  private def querySession(cpus: Int): SparkSession = {
    val b0 = SparkSession.builder()
    val b1 = if (sys.props.contains("spark.master") || sys.env.contains("MASTER")) b0
             else b0.master(s"local[$cpus]")
    val s = b1
      .appName(s"graft-bench-queries")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    // the output line is machine-parsed JSON; pin the locale so f"%.3f"
    // never emits comma decimal separators
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- part 1: operator queries --------------------------------------
    val sq = querySession(cpus)
    // untimed warmup: JIT/codegen/session bring-up otherwise lands on the
    // alphabetically-first query (~3s of pure warmup measured)
    Seq("q8_text_stats", "q1_pricing_summary").foreach { w =>
      try SparkEntry.queries(w)(sq, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sq, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    sq.stop()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // queries-only mode: ad-hoc suite timings at other scale factors
    // (e.g. the sf1 headroom run in BASELINE.md) without the ~22-minute
    // scaling protocol. The driver never sets this.
    if (sys.env.contains("SPARK_GRAFT_BENCH_QUERIES_ONLY")) {
      println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
      return
    }

    // ---- part 2: CDC replay scaling protocol ---------------------------
    val coreList = sys.env.getOrElse("SPARK_GRAFT_CORES_LIST", "2,8")
      .split(',').map(_.trim.toInt).toSeq
    val r = BenchCdc.runScaling(coreList)
    val (nC, mC) = (r.nCores, r.mCores)
    val e = r.est
    // rep_secs keeps its historical [[cores, secs], ...] shape; "reps"
    // adds the kernel-measured external load (ext_cores, -1 = unknown)
    // and the interleaved round each sample belongs to
    val repsJson = r.reps.map(x => f"""[${x.cores},${x.secs}%.2f]""").mkString("[", ",", "]")
    val repsFull = r.reps.map(x =>
      f"""{"cores":${x.cores},"secs":${x.secs}%.2f,"ext_cores":${x.extCores}%.2f,"round":${x.round}}""")
      .mkString("[", ",", "]")
    def opt(v: Option[Double]) = v.map(d => f"$d%.3f").getOrElse("null")
    val cdc = f"""{"events":${r.nEvents},"n_cores":$nC,"secs_n":${e.minSecs(nC)}%.2f,""" +
      f""""events_per_sec_n":${r.throughput(nC)},"n4_cores":$mC,"secs_4n":${e.minSecs(mC)}%.2f,""" +
      f""""events_per_sec_4n":${r.throughput(mC)},"scaling_efficiency":${e.headline}%.3f,""" +
      f""""efficiency_min_of_k":${e.effMinOfK}%.3f,"efficiency_clean":${opt(e.effClean)},""" +
      f""""efficiency_paired_median":${opt(e.effPairedMedian)},""" +
      f""""efficiency_paired_best":${opt(e.effPairedBest)},""" +
      f""""final_rows":${r.rows},"rep_secs":$repsJson,"reps":$repsFull}"""

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"cdc":$cdc,"sf":"$sfDir"}""")
  }
}
