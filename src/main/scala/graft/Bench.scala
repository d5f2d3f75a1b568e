package graft

import org.apache.spark.sql.SparkSession

import graft.BenchCdc.pairedExcludedJson

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
    val s = Sessions.builder("graft-bench-queries", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sq, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    sq.stop()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // failures must be VISIBLE in the machine-parsed line, not only on
    // stderr — a missing dataset would otherwise print a spectacular
    // ~1 s "total" with every query silently broken
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // queries-only mode: ad-hoc suite timings at other scale factors
    // (e.g. the sf1 headroom run in BASELINE.md) without the ~22-minute
    // scaling protocol. The driver never sets this.
    if (sys.env.contains("SPARK_GRAFT_BENCH_QUERIES_ONLY")) {
      println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
      return
    }

    // ---- part 2: CDC replay scaling protocol ---------------------------
    def cdcJson(r: BenchCdc.ScalingResult, extra: String = ""): String = {
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
      f"""{$extra"events":${r.nEvents},"n_cores":$nC,"secs_n":${e.minSecs(nC)}%.2f,""" +
        f""""events_per_sec_n":${r.throughput(nC)},"n4_cores":$mC,"secs_4n":${e.minSecs(mC)}%.2f,""" +
        f""""events_per_sec_4n":${r.throughput(mC)},"scaling_efficiency":${e.headline}%.3f,""" +
        f""""efficiency_min_of_k":${e.effMinOfK}%.3f,"efficiency_clean":${opt(e.effClean)},""" +
        f""""efficiency_paired_median":${opt(e.effPairedMedian)},""" +
        f""""efficiency_paired_best":${opt(e.effPairedBest)},""" +
        // rounds the numerator guard dropped, WITH their measured ratios —
        // the guard bounds inflation but can exclude an honest round at the
        // cutoff boundary; the reader sees what was measured either way
        s""""paired_excluded":${pairedExcludedJson(e)},""" +
        f""""final_rows":${r.rows},"rep_secs":$repsJson,"reps":$repsFull}"""
    }
    val coreList = BenchCdc.coreListFromEnv()
    val cdc = cdcJson(BenchCdc.runScaling(coreList))

    // ---- part 3: INCREMENTAL (multi-epoch) replay scaling --------------
    // The production path is stage-resumable incremental epochs, not one
    // backfill: the same 8M-event log split into SPARK_GRAFT_BENCH_EPOCHS
    // batch dirs, each a ledgered MERGE commit onto the growing table —
    // per-epoch commit overhead and copy-on-write amplification included.
    // 0 disables; its budget is separate so a noisy incremental hunt
    // cannot starve (or be starved by) part 2's. The 8-epoch layout gets
    // its OWN cached workspace (Cfg.work embeds the batch count): ~4 GB
    // more tmpfs alongside part 2's, generated once per boot — the same
    // events in a different batch layout cannot share a log dir.
    val epochs = sys.env.getOrElse("SPARK_GRAFT_BENCH_EPOCHS", "8").toInt
    val cdcIncr =
      if (epochs <= 1) ""
      else {
        val ri = BenchCdc.runScaling(coreList,
          budgetSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_INCR", "1200").toInt,
          nBatches = Some(epochs))
        // echo the MEASURED (post-clamp) epoch count, not the request
        s""","cdc_incremental":${cdcJson(ri, extra = s""""epochs":${ri.nBatches},""")}"""
      }

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"cdc":$cdc$cdcIncr,"sf":"$sfDir"}""")
  }
}
