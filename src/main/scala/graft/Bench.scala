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

    // ---- part 2: CDC replay scaling protocol ---------------------------
    val coreList = sys.env.getOrElse("SPARK_GRAFT_CORES_LIST", "2,8")
      .split(',').map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "6").toInt
    val r = BenchCdc.runScaling(coreList, reps)
    val (nC, mC) = (coreList.head, coreList.last)
    val eff = r.efficiency(nC, mC)
    val repsJson = r.repSecs.map { case (c, s) => f"""[$c,$s%.2f]""" }.mkString("[", ",", "]")
    val cdc = f"""{"events":${r.nEvents},"n_cores":$nC,"secs_n":${r.bestSecs(nC)}%.2f,""" +
      f""""events_per_sec_n":${r.throughput(nC)},"n4_cores":$mC,"secs_4n":${r.bestSecs(mC)}%.2f,""" +
      f""""events_per_sec_4n":${r.throughput(mC)},"scaling_efficiency":$eff%.3f,""" +
      f""""final_rows":${r.rows},"rep_secs":$repsJson}"""

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"cdc":$cdc,"sf":"$sfDir"}""")
  }
}
