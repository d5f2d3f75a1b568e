package graft.tools

import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Phase decomposition of one CDC replay rep — where do the seconds of
  * the scaling bench's 8-core leg go? Times, on the same pinned session
  * BenchCdc.session builds:
  *
  *   scan   — JSON read with the event schema, ALL columns forced
  *            through the parser (noop write), no shuffle;
  *   merge  — scan + union + repartition + window argmax + filter,
  *            noop sink (no parquet encode);
  *   full   — the real BatchReplay.replay epoch (parquet + commit).
  *
  * `parquet+commit ≈ full − merge`, `shuffle+sort ≈ merge − scan`.
  * Usage: graft.tools.ReplayProbe <cores> [reps]  (pin with taskset;
  * expects the BenchCdc log for the current env knobs to exist —
  * run BenchCdc once first or let this generate it).
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val reps = if (args.length > 1) args(1).toInt else 3
    // generate logs BEFORE creating the probe session: ensureLogs builds
    // (and STOPS) its own session, and getOrCreate would hand it an
    // already-active context to kill (BenchCdc.runScaling orders the same)
    val cfg = graft.BenchCdc.probeCfg
    graft.BenchCdc.ensureLogs(cfg)
    val spark = graft.BenchCdc.session(cores)
    val schema = graft.schema.SchemaRegistry.eventSchemaV1
    val glob = s"${cfg.logDir}/batch-*"

    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","secs":$s%.2f}""")
      s
    }

    // warmup (JIT + codegen) on a prefix of the work
    spark.read.schema(schema).json(glob).limit(500000)
      .write.format("noop").mode("overwrite").save()

    (1 to reps).foreach { _ =>
      t("scan") {
        spark.read.schema(schema).json(glob)
          .write.format("noop").mode("overwrite").save()
      }
      t("merge_noop") {
        val events = spark.read.schema(schema).json(glob)
        val bucketExpr = pmod(xxhash64(col("repo")), lit(cfg.buckets)).cast("int")
        val saltExpr = pmod(xxhash64(col("path")), lit(cfg.salt)).cast("int")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_b"), col("_s"), col("repo"), col("path"))
          .orderBy(col("lsn").desc)
        events
          .withColumn("_b", bucketExpr).withColumn("_s", saltExpr)
          .repartition(cfg.buckets * cfg.salt, col("_b"), col("_s"))
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1 && col("op") =!= "D")
          .drop("_rn")
          .write.format("noop").mode("overwrite").save()
      }
      // rm stays OUTSIDE the timer (as BenchCdc.timedRep does): the
      // unlink cost must not pollute the parquet+commit attribution
      val dir = s"${cfg.work}/probe_table_$cores"
      graft.BenchCdc.rm(dir)
      t("full_replay") {
        graft.ingest.BatchReplay.replay(spark, cfg.logDir,
          new LakeTable(spark, dir), numBuckets = cfg.buckets,
          saltBuckets = cfg.salt, recordMeta = false, shaColumn = true,
          format = cfg.format)
      }
      graft.BenchCdc.rm(dir)
    }
    spark.stop()
  }
}
